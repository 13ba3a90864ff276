"""Tiny bidirectional LSTM over block-feature sequences (reference L4-L6).

The reference's recognizer is a numpy bidirectional LSTM over per-column
image features (``ocrolib/lstm.py:403-468`` forward/backward,
``586-709`` Stacked/Reversed/Parallel combinators). The graft's sequence
is the document's block list (time = block index, input = the 8 block
features), and the output layer scores content-vs-boilerplate per block.

Fresh implementation (vanilla LSTM, no peepholes; full-sequence BPTT with
gradient clipping), sized tiny on purpose: weights total a few KB, so in
the distributed pipeline they ride the task closure / a broadcast exactly
like the logistic model. Training runs offline on synthetic sequences
(the reference likewise trains per-sample in one process,
``ocropus-rtrain:277-330``).
"""

from __future__ import annotations

import numpy as np

N_HIDDEN = 12


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -60, 60)))


class TinyBiLSTM:
    """Parallel(forward LSTM, reversed LSTM) -> logistic output (L6)."""

    def __init__(self, n_in: int, n_hidden: int = N_HIDDEN, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.n_in = n_in
        self.n_hidden = n_hidden
        s = 1.0 / np.sqrt(n_in + n_hidden)
        # per direction: W (gates x [x, h]) and bias; gate order i, f, g, o
        self.params: dict[str, np.ndarray] = {}
        for d in ("f", "b"):
            self.params[f"W{d}"] = rng.standard_normal((4 * n_hidden, n_in + n_hidden)) * s
            self.params[f"b{d}"] = np.zeros(4 * n_hidden)
            self.params[f"b{d}"][n_hidden:2 * n_hidden] = 1.0  # forget-gate bias
        self.params["Wout"] = rng.standard_normal(2 * n_hidden) * 0.1
        self.params["bout"] = np.array([0.0])

    # ---------------------------------------------------------------- forward

    def _run_direction(self, X: np.ndarray, d: str):
        """One direction over (T, n_in) -> hidden (T, H) + caches for BPTT."""
        T = X.shape[0]
        H = self.n_hidden
        W, bias = self.params[f"W{d}"], self.params[f"b{d}"]
        h = np.zeros(H)
        c = np.zeros(H)
        Hs = np.zeros((T, H))
        cache = []
        for t in range(T):
            xh = np.concatenate([X[t], h])
            z = W @ xh + bias
            i = _sigmoid(z[:H])
            f = _sigmoid(z[H:2 * H])
            g = np.tanh(z[2 * H:3 * H])
            o = _sigmoid(z[3 * H:])
            c = f * c + i * g
            tc = np.tanh(c)
            h = o * tc
            Hs[t] = h
            cache.append((xh, i, f, g, o, c.copy(), tc))
        return Hs, cache

    def hidden(self, X: np.ndarray):
        Hf, cf = self._run_direction(X, "f")
        Hb, cb = self._run_direction(X[::-1], "b")
        return np.hstack([Hf, Hb[::-1]]), (cf, cb)

    def scores(self, X: np.ndarray) -> np.ndarray:
        """Per-block content probability for one document sequence."""
        if len(X) == 0:
            return np.zeros(0)
        Hcat, _ = self.hidden(X)
        return _sigmoid(Hcat @ self.params["Wout"] + self.params["bout"][0])

    # --------------------------------------------------------------- training

    def _direction_grads(self, X: np.ndarray, cache, dH: np.ndarray, d: str):
        T = X.shape[0]
        H = self.n_hidden
        W = self.params[f"W{d}"]
        dW = np.zeros_like(W)
        db = np.zeros(4 * H)
        dh_next = np.zeros(H)
        dc_next = np.zeros(H)
        for t in range(T - 1, -1, -1):
            xh, i, f, g, o, c, tc = cache[t]
            dh = dH[t] + dh_next
            do = dh * tc * o * (1 - o)
            dc = dh * o * (1 - tc * tc) + dc_next
            di = dc * g * i * (1 - i)
            dg = dc * i * (1 - g * g)
            c_prev = cache[t - 1][5] if t > 0 else np.zeros(H)
            df = dc * c_prev * f * (1 - f)
            dz = np.concatenate([di, df, dg, do])
            dW += np.outer(dz, xh)
            db += dz
            dxh = W.T @ dz
            dh_next = dxh[self.n_in:]
            dc_next = dc * f
        return dW, db

    def fit(self, sequences: list[np.ndarray], labels: list[np.ndarray],
            epochs: int = 30, lr: float = 0.05, clip: float = 5.0) -> float:
        """Full-BPTT Adam distilling the given per-block labels.
        Returns final training accuracy."""
        m = {k: np.zeros_like(v) for k, v in self.params.items()}
        v = {k: np.zeros_like(vv) for k, vv in self.params.items()}
        b1, b2, eps = 0.9, 0.999, 1e-8
        step = 0
        for _ in range(epochs):
            grads = {k: np.zeros_like(p) for k, p in self.params.items()}
            n_blocks = 0
            for X, y in zip(sequences, labels):
                T = len(X)
                if T == 0:
                    continue
                n_blocks += T
                Hcat, (cf, cb) = self.hidden(X)
                p = _sigmoid(Hcat @ self.params["Wout"] + self.params["bout"][0])
                dlogit = p - y  # BCE gradient
                grads["Wout"] += Hcat.T @ dlogit
                grads["bout"] += np.array([dlogit.sum()])
                dH = np.outer(dlogit, self.params["Wout"])
                H = self.n_hidden
                dWf, dbf = self._direction_grads(X, cf, dH[:, :H], "f")
                dWb, dbb = self._direction_grads(X[::-1], cb, dH[::-1, H:], "b")
                grads["Wf"] += dWf; grads["bf"] += dbf
                grads["Wb"] += dWb; grads["bb"] += dbb
            step += 1
            for k in self.params:
                g = grads[k] / max(1, n_blocks)
                norm = float(np.linalg.norm(g))
                if norm > clip:
                    g = g * (clip / norm)
                m[k] = b1 * m[k] + (1 - b1) * g
                v[k] = b2 * v[k] + (1 - b2) * g * g
                mh = m[k] / (1 - b1 ** step)
                vh = v[k] / (1 - b2 ** step)
                self.params[k] = self.params[k] - lr * mh / (np.sqrt(vh) + eps)
        correct = 0
        total = 0
        for X, y in zip(sequences, labels):
            if len(X) == 0:
                continue
            p = self.scores(X)
            correct += int(((p >= 0.5) == (y == 1)).sum())
            total += len(y)
        return correct / max(1, total)

    # ------------------------------------------------------------- persistence

    def to_flat(self) -> np.ndarray:
        return np.concatenate([self.params[k].ravel()
                               for k in ("Wf", "bf", "Wb", "bb", "Wout", "bout")])

    @classmethod
    def from_flat(cls, flat: np.ndarray, n_in: int, n_hidden: int = N_HIDDEN
                  ) -> "TinyBiLSTM":
        m = cls(n_in, n_hidden, seed=0)
        pos = 0
        for k in ("Wf", "bf", "Wb", "bb", "Wout", "bout"):
            shape = m.params[k].shape
            size = int(np.prod(shape))
            m.params[k] = np.asarray(flat[pos:pos + size], dtype=np.float64).reshape(shape)
            pos += size
        if pos != len(flat):
            raise ValueError(f"flat weight size {len(flat)} != expected {pos}")
        return m
