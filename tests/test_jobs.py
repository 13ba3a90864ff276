"""End-to-end smoke for the spark-submit entrypoints (the user-facing CLI
surface, mirroring the reference's ocropus-* programs): each job's main()
runs against tmp parquet and produces the promised outputs. main() is
invoked in-process (the tests' shared local session is picked up by
get_spark), so these cover arg plumbing, not cluster deploy."""

from __future__ import annotations

import json
import sys

import pytest

from dup_ocropy_spark.sources.transcripts import synth_expected, synth_transcripts

sys.path.insert(0, "/root/repo/jobs")

import curate_job  # noqa: E402
import decontaminate_job  # noqa: E402
import dedup_job  # noqa: E402
import eval_job  # noqa: E402
import extract_job  # noqa: E402
import ingest_job  # noqa: E402
import similarity_job  # noqa: E402
import stream_job  # noqa: E402
import train_job  # noqa: E402


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("job_in") / "transcripts"
    synth_transcripts(spark, 30).write.mode("overwrite").parquet(str(d))
    return str(d)


def _run(mod, argv, capsys) -> dict:
    assert mod.main(argv) == 0
    out = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    return json.loads(out[-1])


def test_extract_job_single_pass_and_resume(spark, transcripts_path, tmp_path, capsys):
    rep = _run(extract_job,
               ["--input", transcripts_path, "--output", str(tmp_path / "o1"),
                "--buckets", "0", "--salted"], capsys)
    assert rep["rows"] > 0 and "empty" in rep["rejects"]
    rep2 = _run(extract_job,
                ["--input", transcripts_path, "--output", str(tmp_path / "o2"),
                 "--buckets", "4", "--snapshot", "snap1"], capsys)
    assert rep2["rows"] == rep["rows"]


def test_eval_job_against_ground_truth(spark, transcripts_path, tmp_path, capsys):
    out = str(tmp_path / "pred")
    assert extract_job.main(["--input", transcripts_path, "--output", out,
                             "--buckets", "0"]) == 0
    gt = str(tmp_path / "gt")
    synth_expected(spark, 30).write.mode("overwrite").parquet(gt)
    capsys.readouterr()
    rep = _run(eval_job, ["--pred", out, "--gt", gt], capsys)
    # extraction matches the construction ground truth -> zero CER
    assert rep["cer"] == 0.0 and rep["n_missing"] == 0 and rep["n_turns"] > 0


def test_dedup_job_methods(spark, tmp_path, capsys):
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(6),
        "text": ["alpha bravo charlie delta echo foxtrot golf hotel " * 4] * 2
                + [f"unique document number {i} with its own words " * 4
                   for i in range(4)],
    })
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(src)
    exact = _run(dedup_job, ["--input", src, "--output", str(tmp_path / "e"),
                             "--method", "exact"], capsys)
    assert exact["rows"] == 5  # 6 docs, one exact-dup pair
    for method, min_rows in (("jaccard", 1), ("minhash", 1), ("simhash", 1)):
        rep = _run(dedup_job, ["--input", src, "--output",
                               str(tmp_path / method), "--method", method], capsys)
        assert rep["rows"] >= min_rows, method
        pairs = spark.read.parquet(str(tmp_path / method)).collect()
        assert any({r.doc_a, r.doc_b} == {0, 1} for r in pairs), method


def test_stream_job_bounded_run(spark, transcripts_path, tmp_path, capsys):
    """The streaming entrypoint drains a landing dir in bounded mode:
    file stream -> near-dup gate -> fused extraction -> parquet sink, with
    checkpointed progress; the extracted schema lands in the sink."""
    rep = _run(stream_job,
               ["--input", transcripts_path, "--output", str(tmp_path / "so"),
                "--checkpoint", str(tmp_path / "ck"), "--dedup", "near",
                "--timeout-sec", "1"], capsys)
    assert rep["rows"] > 0 and rep["dedup"] == "near"
    out = spark.read.parquet(str(tmp_path / "so"))
    assert {"conv_id", "turn_idx", "extracted_text",
            "reject_reason"} <= set(out.columns)
    # the gate actually dropped something: the synth corpus plants the
    # identical short payload 'hi' across conversations, which dedups
    # under the exact fallback — rows == n_raw would mean a no-op gate
    n_raw = spark.read.parquet(transcripts_path).count()
    assert rep["rows"] < n_raw


def test_quality_gate_counts_sentence_initial_stopwords(spark):
    """The curation stop-word gate must be case-folded and word-bounded:
    'The' at sentence starts and punctuation-adjacent hits count. The old
    ' the ' length-arithmetic form saw only 2 of the 5 hits here."""
    from dup_ocropy_spark.plans.curate import quality_columns

    text = "The quick fox. The lazy dog! A bird, a plane and the end of it now."
    docs = spark.createDataFrame([("d1", text)], "conv_id string, text string")
    r = quality_columns(docs).collect()[0]
    n_words = len(text.split())                      # 16
    assert r.n_words == n_words
    # the(x3: 2 sentence-initial 'The' + 1 lowercase) + a(x2: 'A', 'a');
    # 'plane'/'and' must NOT match inside words
    assert r.stop_ratio == round(5 / n_words, 6), r.stop_ratio


def test_dedup_job_two_phase_matches_in_memory(spark, tmp_path, capsys):
    """--two-phase (materialized signature table -> join from parquet) must
    produce the exact same pair set as the in-memory persist path, and must
    actually write the signature table."""
    import os

    import pandas as pd

    rng_words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                 "juliet kilo lima").split()
    texts = []
    for i in range(12):
        words = [rng_words[(i * 7 + j) % len(rng_words)] for j in range(40)]
        texts.append(" ".join(words))
    texts.append(texts[0])                      # exact dup
    texts.append(texts[1][:150] + " mutated tail words here")  # near dup
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    src = str(tmp_path / "docs")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(src)

    for method in ("jaccard", "minhash", "simhash"):
        mem_out = str(tmp_path / f"{method}_mem")
        tp_out = str(tmp_path / f"{method}_tp")
        _run(dedup_job, ["--input", src, "--output", mem_out,
                         "--method", method], capsys)
        rep = _run(dedup_job, ["--input", src, "--output", tp_out,
                               "--method", method, "--two-phase"], capsys)
        assert rep["two_phase"] is True
        assert os.path.exists(tp_out + "_signatures"), method
        mem = {(r.doc_a, r.doc_b)
               for r in spark.read.parquet(mem_out).select("doc_a", "doc_b").collect()}
        tp = {(r.doc_a, r.doc_b)
              for r in spark.read.parquet(tp_out).select("doc_a", "doc_b").collect()}
        assert mem == tp, f"{method}: two-phase pairs differ from in-memory"
        assert mem, f"{method}: fixture produced no pairs"


def test_similarity_job_methods(spark, tmp_path, capsys):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(4)
    base = rng.standard_normal((80, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    for q in range(3):             # plant one near neighbor per query
        v = base[q] + 0.05 * rng.standard_normal(64)
        base[10 + q] = v / np.linalg.norm(v)
    src = tmp_path / "emb"
    src.mkdir()
    pq.write_table(pa.Table.from_arrays(
        [pa.array(range(80), type=pa.int64()),
         pa.array([list(map(float, r)) for r in base],
                  type=pa.list_(pa.float32()))],
        names=["vec_id", "embedding"]), src / "part.parquet")
    results = {}
    for method in ("brute", "lsh", "ivf"):
        rep = _run(similarity_job,
                   ["--input", str(src), "--output", str(tmp_path / method),
                    "--method", method, "--n-queries", "3", "--top-k", "2"],
                   capsys)
        assert rep["rows"] == 6, method  # 3 queries x top-2
        got = spark.read.parquet(str(tmp_path / method)).collect()
        results[method] = {(r.query_id, r.vec_id) for r in got}
        # every method must surface the planted neighbor for each query
        for q in range(3):
            assert (q, 10 + q) in results[method], method


def test_curate_job_pipeline(spark, tmp_path, capsys):
    """extract -> quality gate -> dedup, with planted duplicate
    conversations: the duplicates must NOT survive, every drop must be
    accounted for in the stats line."""
    from pyspark.sql import functions as F

    base = synth_transcripts(spark, 25)
    dup = base.withColumn("conv_id", F.concat(F.lit("dup_"), "conv_id"))
    src = str(tmp_path / "in")
    base.unionByName(dup).write.mode("overwrite").parquet(src)
    rep = _run(curate_job, ["--input", src, "--output",
                            str(tmp_path / "curated")], capsys)
    assert rep["n_quality"] <= rep["n_convs"]
    # every quality conversation exists twice -> exact dedup halves it
    assert rep["n_after_exact_dedup"] == rep["n_quality"] // 2
    assert rep["n_neardup_candidates"] >= rep["n_after_exact_dedup"]
    curated = spark.read.parquet(str(tmp_path / "curated"))
    assert curated.count() == rep["n_after_exact_dedup"]
    texts = curated.select("text").toPandas()["text"]
    assert texts.nunique() == len(texts)  # no duplicate text survived


def test_train_job_writes_model(spark, transcripts_path, tmp_path, capsys):
    model = str(tmp_path / "model.json")
    rep = _run(train_job, ["--input", transcripts_path, "--model-out", model,
                           "--epochs", "60"], capsys)
    assert rep["train_accuracy"] > 0.8
    art = json.load(open(model))
    assert art["kind"] == "logistic" and len(art["weights"]) > 0


def test_train_job_calibrated_threshold_flows_to_config(spark, transcripts_path,
                                                        tmp_path, capsys):
    """--calibrate stores the corpus-estimated decision threshold in the
    artifact meta, and config_with_model applies it over the static
    default — the full train -> calibrate -> artifact -> config loop."""
    from dup_ocropy_spark.sources.models import config_with_model

    model = str(tmp_path / "model_cal.json")
    rep = _run(train_job, ["--input", transcripts_path, "--model-out", model,
                           "--epochs", "60", "--calibrate"], capsys)
    assert 0.1 <= rep["content_threshold"] <= 0.9
    art = json.load(open(model))
    assert art["meta"]["threshold_accuracy"] >= 0.95
    cfg = config_with_model(model)
    assert cfg.content_threshold == art["meta"]["content_threshold"]
    assert cfg.classifier == "logistic" and cfg.weights is not None


def test_quality_gate_repetition_fractions(spark):
    """Gopher-style repetition signals (Rae et al. 2021 App. A1.1):
    a document that is one line repeated must fail the dup_line_frac <=
    0.3 gate even when length/stopword gates pass; a prose doc with
    distinct lines passes, and the fractions match hand computation."""
    from dup_ocropy_spark.plans.curate import quality_columns

    degenerate = "\n".join(["the cat sat on a mat with a hat today fine"] * 10)
    prose = ("The quick brown fox jumps over a lazy dog near the river.\n"
             "A second line with the different words entirely for sure.")
    docs = spark.createDataFrame(
        [("bad", degenerate), ("good", prose)], "conv_id string, text string")
    rows = {r.conv_id: r for r in quality_columns(docs).collect()}
    assert rows["bad"].dup_line_frac == 0.9           # 1 - 1/10
    assert rows["bad"].is_quality is False
    assert rows["good"].dup_line_frac == 0.0
    assert rows["good"].is_quality is True
    # dup_word_frac: lowercased whitespace words, 1 - distinct/total
    words = degenerate.lower().split()
    assert rows["bad"].dup_word_frac == round(1 - len(set(words)) / len(words), 6)


def test_curate_redacts_planted_pii(spark):
    """Planted email/phone in a transcript turn must not survive curation,
    and the stats line must account for the masked values."""
    from pyspark.sql import functions as F

    from dup_ocropy_spark.plans.curate import curate
    from dup_ocropy_spark.sources.transcripts import synth_transcripts

    base = synth_transcripts(spark, 12)
    pii = F.concat(
        F.col("text"),
        F.lit(" Contact leak.target@example.com or 555-867-5309 for info."))
    src = base.withColumn(
        "text", F.when(F.col("turn_idx") == 1, pii).otherwise(F.col("text")))
    curated, stats = curate(src)
    rep = stats.collect()[0].asDict()
    assert rep["n_pii_redacted"] >= 1
    leaked = curated.where(
        F.col("text").contains("leak.target@example.com")
        | F.col("text").contains("555-867-5309")).count()
    assert leaked == 0
    masked = curated.where(F.col("text").contains("<EMAIL>")).count()
    assert masked >= 1


def test_decontaminate_job_drops_planted_leak(spark, tmp_path, capsys):
    """Corpus with one doc verbatim-containing a benchmark question: the
    job drops exactly that doc and accounts for it."""
    q = ("which ancient trade route connected the eastern markets to the "
         "western ports across the mountain passes during winter")
    bench = spark.createDataFrame([("b0", q)], "doc_id string, text string")
    docs = spark.createDataFrame([
        ("c0", "A long treatise about maritime logistics and harbor law."),
        ("c1", "Quiz dump: " + q + " Answer: the silk road obviously."),
        ("c2", "Unrelated prose about gardening through the winter months."),
    ], "doc_id string, text string")
    bpath, cpath = str(tmp_path / "bench"), str(tmp_path / "corpus")
    bench.write.parquet(bpath); docs.write.parquet(cpath)
    rep = _run(decontaminate_job,
               ["--input", cpath, "--benchmark", bpath,
                "--output", str(tmp_path / "clean")], capsys)
    assert rep["n_docs"] == 3 and rep["n_contaminated"] == 1
    clean = spark.read.parquet(str(tmp_path / "clean"))
    assert {r.doc_id for r in clean.collect()} == {"c0", "c2"}


def test_curate_near_dedup_closes_clusters(spark):
    """Three near-identical conversations (not byte-identical, so exact
    dedup keeps all three) collapse to ONE survivor under
    curate(near_dedup=True); default mode keeps all three and only
    counts the candidates."""
    from pyspark.sql import functions as F

    from dup_ocropy_spark.plans.curate import curate

    base_words = ("the quick brown fox jumps over a lazy dog while the rain "
                  "in spain stays mainly on the plain and every careful "
                  "writer keeps the prose flowing onward through the long "
                  "afternoon with a steady patient hand for many hours") * 3
    rows = []
    for k, tag in enumerate(("alpha", "beta", "gamma")):
        rows.append((f"conv_near_{k}", 0, "user",
                     base_words + f" unique closing {tag} remark.",
                     None, None))
    # one unrelated conversation that must survive untouched
    rows.append(("conv_other", 0, "user",
                 "A completely different conversation about winter harbor "
                 "logistics, written with the other vocabulary entirely and "
                 "a different rhythm for the gates to accept it as prose "
                 "with the usual words the and a sprinkled in everywhere.",
                 None, None))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    kept_default, stats_default = curate(t)
    assert kept_default.count() == 4            # exact dedup drops nothing
    assert stats_default.collect()[0].n_neardup_candidates >= 2
    kept_closed, stats_closed = curate(t, near_dedup=True)
    ids = {r.conv_id for r in kept_closed.select("conv_id").collect()}
    assert ids == {"conv_near_0", "conv_other"}  # min of the cluster + other
    assert stats_closed.collect()[0].n_after_exact_dedup == 2


def test_ingest_job_quarantines_and_reports(spark, tmp_path, capsys):
    import json as _json

    lines = [
        _json.dumps({"conv_id": "c1", "turn_idx": 0, "role": "user",
                     "text": "good row body text", "tool": None,
                     "ts": "2026-01-01T00:00:00Z"}),
        "{broken line",
    ]
    src = tmp_path / "dump.jsonl"
    src.write_text("\n".join(lines) + "\n")
    rep = _run(ingest_job, ["--input", str(src),
                            "--output", str(tmp_path / "parsed")], capsys)
    assert (rep["n_valid"], rep["n_quarantined"]) == (1, 1)
    q = spark.read.parquet(str(tmp_path / "parsed_quarantine"))
    assert q.collect()[0].raw_line == "{broken line"


def test_dedup_against_snapshot_incremental(spark):
    """Two ingest batches: batch-2 rows already accepted in batch-1 (by
    normalized text, not byte identity) are dropped; the fingerprint
    table grows by exactly the fresh survivors."""
    from dup_ocropy_spark.operators.dedup import (
        dedup_against_snapshot, doc_fingerprints,
    )

    b1 = spark.createDataFrame(
        [("a1", "the first document body"),
         ("a2", "a second document body"),
         ("a3", "a second   document body")],   # in-batch near-exact dup
        "doc_id string, text string")
    empty = doc_fingerprints(b1).limit(0)
    fresh1, fps1 = dedup_against_snapshot(b1, empty)
    assert {r.doc_id for r in fresh1.collect()} == {"a1", "a2"}  # a3 ws-dup
    assert fps1.count() == 2

    b2 = spark.createDataFrame(
        [("b1", "THE FIRST DOCUMENT BODY"),     # case-dup of a1
         ("b2", "a genuinely new document body")],
        "doc_id string, text string")
    fresh2, fps2 = dedup_against_snapshot(b2, fps1)
    assert {r.doc_id for r in fresh2.collect()} == {"b2"}
    assert fps2.count() == 3
    # idempotent: replaying batch 2 yields nothing new
    fresh3, fps3 = dedup_against_snapshot(b2, fps2)
    assert fresh3.count() == 0 and fps3.count() == 3


def test_ingest_then_curate_job_chain(spark, tmp_path, capsys):
    """The raw-dump-to-curated-corpus path a production user actually
    runs: JSONL (with corrupt lines and a duplicated conversation) ->
    ingest_job -> curate_job, chained on the parquet handoff."""
    import json as _json

    conv = [
        {"conv_id": c, "turn_idx": t, "role": "user",
         "text": f"turn {t} of conversation body with the usual words and "
                 f"a natural sentence long enough to pass every gate.",
         "tool": None, "ts": f"2026-01-01T00:0{t}:00Z"}
        for c in ("c1", "c1_dup") for t in range(3)
    ]
    lines = [_json.dumps(r) for r in conv] + ["{not json", "[]"]
    src = tmp_path / "dump.jsonl"
    src.write_text("\n".join(lines) + "\n")
    rep1 = _run(ingest_job, ["--input", str(src),
                             "--output", str(tmp_path / "parsed")], capsys)
    assert rep1["n_valid"] == 6 and rep1["n_quarantined"] == 2
    rep2 = _run(curate_job, ["--input", str(tmp_path / "parsed"),
                             "--output", str(tmp_path / "curated")], capsys)
    # both conversations reassemble to identical text -> exact dedup to 1
    assert rep2["n_convs"] == 2 and rep2["n_after_exact_dedup"] == 1
    curated = spark.read.parquet(str(tmp_path / "curated"))
    assert curated.count() == 1


def test_curate_job_since_snapshot_two_day_ingest(spark, tmp_path, capsys):
    """Daily-ingest e2e: day 1 fills the fingerprint table; day 2's batch
    (a superset re-dump) writes ONLY the genuinely new conversations and
    appends only their fingerprints; re-running day 2 is idempotent
    (empty output, no table growth)."""
    day1 = str(tmp_path / "day1")
    day2 = str(tmp_path / "day2")
    snap = str(tmp_path / "fp_snapshot")
    synth_transcripts(spark, 30).write.mode("overwrite").parquet(day1)
    # day-2 dump re-delivers day-1's 30 convs plus 15 new ones
    synth_transcripts(spark, 45).write.mode("overwrite").parquet(day2)

    out1 = str(tmp_path / "out1")
    rep1 = _run(curate_job, ["--input", day1, "--output", out1,
                             "--since-snapshot", snap], capsys)
    assert rep1["n_snapshot_dropped"] == 0      # empty history: nothing dropped
    assert rep1["n_written"] == rep1["n_after_exact_dedup"] > 0
    n_fp_day1 = spark.read.parquet(snap).count()
    assert n_fp_day1 == rep1["n_written"]

    out2 = str(tmp_path / "out2")
    rep2 = _run(curate_job, ["--input", day2, "--output", out2,
                             "--since-snapshot", snap], capsys)
    # every day-1 conversation is dropped as already-seen
    assert rep2["n_snapshot_dropped"] == rep1["n_written"]
    assert rep2["n_written"] > 0
    day2_ids = {r.conv_id for r in spark.read.parquet(out2).collect()}
    day1_ids = {r.conv_id for r in spark.read.parquet(out1).collect()}
    assert day2_ids and not (day2_ids & day1_ids)
    # fingerprint table grew append-only by exactly the new survivors
    n_fp_day2 = spark.read.parquet(snap).count()
    assert n_fp_day2 == n_fp_day1 + rep2["n_written"]

    # idempotent re-run of day 2: all seen, zero written, no table growth
    out3 = str(tmp_path / "out3")
    rep3 = _run(curate_job, ["--input", day2, "--output", out3,
                             "--since-snapshot", snap], capsys)
    assert rep3["n_written"] == 0
    assert spark.read.parquet(snap).count() == n_fp_day2


def test_extract_job_turn_fp_out_feeds_stream_snapshot(spark, transcripts_path,
                                                       tmp_path, capsys):
    """--turn-fp-out appends the TURN-grain fingerprint table the stream's
    snapshot dedup anti-joins: contents match turn_fingerprints() on the
    same input, and a second batch grows the table append-only."""
    from dup_ocropy_spark.streaming import turn_fingerprints

    out = str(tmp_path / "ext_out")
    fp_dir = str(tmp_path / "turn_fps")
    rep = _run(extract_job, ["--input", transcripts_path, "--output", out,
                             "--buckets", "0", "--turn-fp-out", fp_dir],
               capsys)
    want = turn_fingerprints(spark.read.parquet(transcripts_path))
    n_want = want.count()
    assert rep["turn_fps_total"] == n_want
    got = spark.read.parquet(fp_dir)
    assert got.orderBy("conv_id", "turn_idx").collect() == \
        want.orderBy("conv_id", "turn_idx").collect()
    # second run appends (the daily-batch pattern); table grows
    rep2 = _run(extract_job, ["--input", transcripts_path, "--output", out,
                              "--buckets", "0", "--turn-fp-out", fp_dir],
                capsys)
    assert rep2["turn_fps_total"] == 2 * n_want


def test_curate_job_decontaminate_and_lm_flags(spark, tmp_path, capsys):
    """The one-CLI curation recipe: --decontaminate drops a planted
    benchmark leak, --lm-keep-fraction drops the perplexity tail, and
    both drops appear in the stats line (nothing silent)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "in")
    tr = synth_transcripts(spark, 25)
    # plant a benchmark leak as one conversation's only content: a long
    # distinctive sentence that will survive extraction verbatim
    leak = ("the quick benchmark question about the photosynthesis energy "
            "transfer pathways in a c4 plant under the drought stress "
            "answered with a mitochondrial background detail for the "
            "contamination test of a curation pipeline ")
    leak_row = spark.createDataFrame(
        [("convLEAK", 0, "user", leak * 3, "", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    tr.unionByName(leak_row).write.mode("overwrite").parquet(src)

    bench_dir = str(tmp_path / "bench")
    spark.createDataFrame([("b1", leak)], "doc_id string, text string") \
        .write.mode("overwrite").parquet(bench_dir)

    out = str(tmp_path / "out")
    rep = _run(curate_job, ["--input", src, "--output", out,
                            "--decontaminate", bench_dir,
                            "--lm-keep-fraction", "0.9"], capsys)
    assert rep["n_contaminated_dropped"] >= 1
    assert rep["n_lm_dropped"] >= 1
    written = spark.read.parquet(out)
    assert written.where(F.col("conv_id") == "convLEAK").count() == 0
    assert written.count() > 0


def test_train_job_lstm_artifact_roundtrip(spark, transcripts_path, tmp_path,
                                           capsys):
    """--lstm writes a loadable 'lstm' artifact whose config drives the
    extraction pipeline (the provenance path for the committed
    tinybilstm_v1.json artifact, at test-sized epochs)."""
    from dup_ocropy_spark.sources.models import config_with_model

    out = str(tmp_path / "lstm.json")
    rep = _run(train_job, ["--input", transcripts_path, "--model-out", out,
                           "--lstm", "--lstm-convs", "12", "--epochs", "8"],
               capsys)
    assert rep["kind"] == "lstm"
    cfg = config_with_model(out)
    assert cfg.classifier == "lstm" and len(cfg.weights) == 2041
    from dup_ocropy_spark.plans.extract import extract

    got = extract(synth_transcripts(spark, 5), cfg)
    assert got.count() > 0


def test_dedup_job_string_ids_all_methods(spark, tmp_path, capsys):
    """String conv_id keys (the curate pipeline's output) must work for
    EVERY method: ids pass through uncast, and simhash's signature
    schema mirrors the input id type instead of hardcoding long. Null
    and blank docs emit no signature (a shared placeholder hash made
    every payload-less doc a hamming-0 'near-dup' of all the others)."""
    import pandas as pd

    docs = pd.DataFrame({
        "conv_id": [f"conv{i:03d}" for i in range(8)],
        "text": ["alpha bravo charlie delta echo foxtrot golf hotel " * 4] * 2
                + [f"unique document number {i} with its own words " * 4
                   for i in range(4)] + [None, "   "],
    })
    src = str(tmp_path / "sdocs")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(src)
    for method in ("exact", "jaccard", "minhash", "simhash"):
        rep = _run(dedup_job, ["--input", src, "--output",
                               str(tmp_path / f"s_{method}"),
                               "--method", method, "--id-col", "conv_id"],
                   capsys)
        out = spark.read.parquet(str(tmp_path / f"s_{method}"))
        if method == "exact":
            assert rep["rows"] >= 5   # dup pair collapsed; null/blank kept
        else:
            pairs = [(r.doc_a, r.doc_b) for r in out.collect()]
            assert ("conv000", "conv001") in pairs, (method, pairs)
            # payload-less docs never appear in any pair
            flat = {x for p in pairs for x in p}
            assert not ({"conv006", "conv007"} & flat), (method, pairs)


def test_stream_job_snapshot_mode_two_publish_refresh(spark, tmp_path):
    """The documented snapshot-refresh OPERATIONAL CYCLE, job-tested:
    a batch publisher appends turn fingerprints to the fp table while
    the stream job runs, and the job's per-batch fresh spark.read.parquet
    of the fp table (inside foreachBatch) makes
    those fps gate the very next micro-batch — no restart. Publish 1
    seeds the table (turn A already ingested); the stream extracts only
    B from landing file 1. Publish 2 appends C's fp and THEN lands a
    file re-ingesting C alongside new D: only D survives. Ordering is
    deterministic because any micro-batch that reads the landing file
    refreshes the listing first, and the fps were written before the
    file existed."""
    import datetime as dt
    import os
    import threading
    import time

    import pandas as pd

    from dup_ocropy_spark.streaming import turn_fingerprints

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    texts = {k: f"payload {k} with plenty of distinct words for the gate"
             for k in "ABCD"}

    def frame(keys, minute):
        return spark.createDataFrame(pd.DataFrame({
            "conv_id": [f"c{k}" for k in keys],
            "turn_idx": pd.array([0] * len(keys), dtype="int32"),
            "role": "user",
            "text": [texts[k] for k in keys],
            "tool": "",
            "ts": [base + dt.timedelta(minutes=minute)] * len(keys),
        }))

    snap, land, out_dir, ck = (str(tmp_path / d)
                               for d in ("fps", "land", "out", "ck"))
    os.makedirs(land)
    turn_fingerprints(frame("A", 0)).write.mode("overwrite").parquet(snap)
    frame("AB", 0).coalesce(1).write.parquet(os.path.join(land, "f1"))

    rc: dict = {}
    th = threading.Thread(target=lambda: rc.update(code=stream_job.main(
        ["--input", land + "/*", "--output", out_dir,
         "--checkpoint", ck, "--dedup", "snapshot", "--snapshot-fps", snap,
         "--timeout-sec", "10"])))
    th.start()

    def wait_for(want: set, deadline: float = 90.0) -> set:
        end = time.time() + deadline
        got: set = set()
        while time.time() < end:
            try:
                got = set(spark.read.parquet(out_dir)
                          .select("conv_id").toPandas().conv_id)
            except Exception:
                got = set()
            if want <= got:
                return got
            time.sleep(0.3)
        raise AssertionError(f"sink never produced {want}; got {got}")

    try:
        got1 = wait_for({"cB"})
        assert "cA" not in got1  # blocked by publish-1 history
        # publish 2: fps FIRST, then the landing file that re-ingests C
        turn_fingerprints(frame("C", 5)).write.mode("append").parquet(snap)
        frame("CD", 5).coalesce(1).write.parquet(os.path.join(land, "f2"))
        wait_for({"cD"})
    finally:
        th.join(timeout=120)
    assert rc.get("code") == 0 and not th.is_alive()
    final = set(spark.read.parquet(out_dir).select("conv_id")
                .toPandas().conv_id)
    # A and C blocked (C only via the mid-run refresh); B and D extracted
    assert final == {"cB", "cD"}


def test_pack_job_default_and_self_contained_with_codec(spark, tmp_path, capsys):
    """The packing CLI closes the curation loop (docs -> tokens -> global
    seq ids -> shard dirs). Default mode: every doc lands exactly once,
    offsets within budget. --self-contained --train-codec: trains + saves
    a codec artifact (loadable, refuses non-codec JSON), and the written
    slices tile the corpus token count exactly."""
    import glob

    import pack_job
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": range(60),
        "text": [f"document number {i} " + ("alpha beta gamma delta " * (i % 7 + 1))
                 for i in range(60)],
    })
    src = str(tmp_path / "pdocs")
    spark.createDataFrame(docs).write.mode("overwrite").parquet(src)

    out1 = str(tmp_path / "shards_default")
    rep = _run(pack_job, ["--input", src, "--output", out1,
                          "--budget", "64", "--seqs-per-shard", "4"], capsys)
    assert rep["n_docs"] == 60 and rep["codec"] == "regex"
    assert rep["n_seqs"] >= 1 and rep["n_shards"] >= 1
    back = spark.read.parquet(out1)
    assert back.count() == 60  # default mode: one row per doc
    assert back.where("seq_offset >= 64 OR seq_offset < 0").count() == 0
    assert len(glob.glob(f"{out1}/shard_id=*")) == rep["n_shards"]

    codec_path = str(tmp_path / "merges.json")
    out2 = str(tmp_path / "shards_sc")
    rep2 = _run(pack_job, ["--input", src, "--output", out2,
                           "--budget", "64", "--seqs-per-shard", "4",
                           "--self-contained",
                           "--train-codec", "24", "--codec-out", codec_path],
                capsys)
    from dup_ocropy_spark.operators.codec import (
        bpe_token_counts, load_codec,
    )

    merges = load_codec(codec_path)
    assert 0 < len(merges) <= 24 and rep2["codec"] == f"trained:{len(merges)}"
    # slices tile the learned-codec token total exactly
    want = bpe_token_counts(spark.read.parquet(src), merges) \
        .agg({"n_tokens_bpe_learned": "sum"}).collect()[0][0]
    assert rep2["n_tokens"] == want and rep2["n_docs"] == 60
    # a non-codec JSON is refused
    bad = tmp_path / "model.json"
    bad.write_text('{"weights": [1, 2, 3]}')
    with pytest.raises(ValueError, match="bpe_merges_v1"):
        pack_job.main(["--input", src, "--output", str(tmp_path / "x"),
                       "--codec", str(bad)])


def test_stream_job_snapshot_mode_tolerates_absent_fp_table(spark, tmp_path):
    """First deployment: the batch publisher hasn't produced the fp table
    yet. Every micro-batch must treat history as empty (extract all
    turns) instead of killing the stream on the unreadable static side."""
    import os

    import pandas as pd

    land = str(tmp_path / "land")
    os.makedirs(land)
    spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c0", "c1"],
        "turn_idx": pd.array([0, 0], dtype="int32"),
        "role": "user",
        "text": ["plenty of distinct words here for the gate one",
                 "plenty of distinct words here for the gate two"],
        "tool": "",
        "ts": pd.to_datetime(["2026-01-01"] * 2, utc=True),
    })).coalesce(1).write.parquet(os.path.join(land, "f1"))
    assert stream_job.main(
        ["--input", land + "/*", "--output", str(tmp_path / "out"),
         "--checkpoint", str(tmp_path / "ck"), "--dedup", "snapshot",
         "--snapshot-fps", str(tmp_path / "never_published"),
         "--timeout-sec", "1"]) == 0
    got = set(spark.read.parquet(str(tmp_path / "out"))
              .select("conv_id").toPandas().conv_id)
    assert got == {"c0", "c1"}
