"""Scale-up evidence run (round-5 verdict #6): the headline pipelines at
1× and 10× data, per-stage wall times, so the "plans survive 100×" claims
carry measurements instead of plan reading.

The driver ships parquet only up to sf0.1, so the 10× inputs are
synthesized deterministically (same shapes: crawl pages via
datagen.crawl.generate_pages; documents/embeddings via the generators
below, matching the sf tables' schemas — word-soup text with planted
near-dup structure, 64-dim float embeddings with planted twin clusters,
both seeded). Near-dup density is held CONSTANT across scales so the
LSH/dedup work grows linearly with the corpus, not quadratically by
construction.

Stages timed (warm JVM, min-of-2 per stage, window probe recorded):
- crawl: scan→rollup(minute count) / tier chain hour+day+week /
  window-salted Gorilla encode
- corpus: quality filter / MinHash-LSH pairs / canonical dedup /
  decontaminate / hash split / the full composed pipeline
- embeddings: LSH candidates + cosine verify (pair stage) / connected
  components / full embedding_dup_clusters composition

Writes scale_evidence JSON to the path given as argv[1] (default
/root/repo/scale_evidence_r5.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tslib_spark.session import get_spark  # noqa: E402

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data join "
    "plan stage shuffle codec tier rollup crawl page site token text model"
).split()


def synth_documents(spark, n_docs: int, seed: int = 99, path: str | None = None):
    """documents-shaped table (doc_id, text, lang, source, n_chars) with a
    fixed 8% near-dup rate: doc i with i % 12 == 11 is a one-word
    perturbation of doc i-1 — constant dup density at every scale."""
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "zh", "de", "fr", "es"])
    texts = []
    for i in range(n_docs):
        if i % 12 == 11 and texts:
            words = texts[-1].split()
            words[int(rng.integers(0, len(words)))] = "zzz"
            texts.append(" ".join(words))
        else:
            n = int(rng.integers(30, 80))
            texts.append(" ".join(np.array(VOCAB)[rng.integers(0, len(VOCAB), n)]))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": langs[rng.integers(0, len(langs), n_docs)],
            "source": [f"src{int(x)}" for x in rng.integers(0, 20, n_docs)],
        }
    )
    pdf["n_chars"] = pdf["text"].str.len().astype(np.int64)
    df = spark.createDataFrame(pdf)
    if path:
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    return df


def synth_embeddings(spark, n_vecs: int, dim: int = 64, seed: int = 7, path: str | None = None):
    """embeddings-shaped table with 5% planted twins (vec i ≡ perturbed
    vec i-1) — constant near-dup density at every scale."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_vecs, dim))
    twin = np.arange(n_vecs) % 20 == 19
    X[twin] = X[np.flatnonzero(twin) - 1] * 1.01 + 0.02
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [r.astype(np.float32).tolist() for r in X],
            "label": rng.integers(0, 10, n_vecs).astype(np.int32),
        }
    )
    df = spark.createDataFrame(pdf)
    if path:
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    return df


def timed(fn, repeats: int = 2) -> float:
    fn()  # warm (JIT/codegen dominates cold first runs)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def crawl_stages(spark, n_events: int, n_urls: int, path: str) -> dict[str, float]:
    from tslib_spark.codec.chunks import encode_chunks
    from tslib_spark.datagen.crawl import generate_pages
    from tslib_spark.operators.downsample import tier_chain
    from tslib_spark.operators.rollup import rollup_pages

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_pages(
            spark, n_events=n_events, n_urls=n_urls, n_minutes=60 * 24 * 21
        ).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)
    out = {}
    out["rollup_minute"] = timed(lambda: rollup_pages(pages).select(F.sum("cnt")).collect())
    minute = rollup_pages(pages).persist()
    minute.count()
    out["tier_chain"] = timed(
        lambda: [
            tier_chain(minute, ["url", "lang"])[t].select(F.sum("cnt")).collect()
            for t in ("hour", "day", "week")
        ]
    )
    minute.unpersist()
    # the north-star write path measured EXACTLY as the bench scale_job
    # does: one linear action, NO live persist (a 30M-row cached tier
    # sharing the heap with the encode kernels is GC contamination, not
    # the production shape)
    tidy = rollup_pages(pages).select(
        "url", "lang",
        (F.unix_timestamp("bucket_ts") / 60).cast("long").alias("bucket_idx"),
        F.col("cnt").cast("double").alias("value"),
    )
    out["rollup_gorilla_encode"] = timed(
        lambda: encode_chunks(tidy, ["url", "lang"]).select(F.sum("n_points")).collect()
    )
    return out


def corpus_stages(spark, docs) -> dict[str, float]:
    from tslib_spark.operators.components import dedup_keep_canonical
    from tslib_spark.operators.decontaminate import decontaminate
    from tslib_spark.operators.dedup import near_dup_minhash
    from tslib_spark.operators.quality_filter import quality_filter
    from tslib_spark.operators.sampling import hash_split

    n = docs.count()
    train_pool = docs.filter(F.col("doc_id") < int(n * 0.9))
    evals = docs.filter(F.col("doc_id") >= int(n * 0.9))
    out = {}
    out["quality_filter"] = timed(
        lambda: _force(quality_filter(train_pool, "doc_id", "text", min_tokens=20))
    )
    kept = train_pool.join(
        quality_filter(train_pool, "doc_id", "text", min_tokens=20)
        .filter(F.col("keep")).select("doc_id", "total_tokens"),
        "doc_id",
    ).persist()
    kept.count()
    pairs_fn = lambda: near_dup_minhash(  # noqa: E731
        kept, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5,
        max_bucket=2000,
    )
    out["minhash_pairs"] = timed(lambda: _force(pairs_fn()))
    out["canonical_dedup"] = timed(
        lambda: _force(dedup_keep_canonical(kept, "doc_id", pairs_fn().select("id_a", "id_b")))
    )
    deduped = dedup_keep_canonical(kept, "doc_id", pairs_fn().select("id_a", "id_b"))
    out["decontaminate"] = timed(
        lambda: _force(decontaminate(deduped, "doc_id", "text", evals, "text", n=8))
    )
    clean = decontaminate(deduped, "doc_id", "text", evals, "text", n=8)
    out["hash_split"] = timed(
        lambda: _force(hash_split(clean, "doc_id", {"train": 8.0, "val": 1.0, "test": 1.0}, seed=7))
    )
    out["full_pipeline"] = timed(
        lambda: hash_split(
            decontaminate(
                dedup_keep_canonical(kept, "doc_id", pairs_fn().select("id_a", "id_b")),
                "doc_id", "text", evals, "text", n=8,
            ),
            "doc_id", {"train": 8.0, "val": 1.0, "test": 1.0}, seed=7,
        ).groupBy("split").agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("total_tokens").alias("n_tokens")
        ).collect()
    )
    kept.unpersist()
    return out


def embedding_stages(spark, emb) -> dict[str, float]:
    from tslib_spark.operators.components import connected_components
    from tslib_spark.operators.similarity import cosine_near_dup_pairs

    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    pairs_fn = lambda: cosine_near_dup_pairs(  # noqa: E731
        base, "embedding", "vec_id", dim=64, threshold=0.9, n_planes=10,
        n_bands=4, max_bucket=2000,
    )
    out = {}
    out["lsh_cosine_pairs"] = timed(lambda: _force(pairs_fn()))
    out["connected_components"] = timed(
        lambda: _force(connected_components(pairs_fn().select("id_a", "id_b")))
    )
    # the full composition: LSH pairs -> components -> labels joined back
    # to the corpus with cluster sizes (r5 ADVICE: this stage previously
    # re-timed the bare CC lambda, recording a duplicate measurement
    # labeled as the composition)
    def _full_composition():
        labels = connected_components(
            pairs_fn().select("id_a", "id_b"), nodes=base.select("vec_id")
        )
        return (
            base.join(labels.withColumnRenamed("id", "vec_id"), "vec_id")
            .groupBy("component")
            .agg(F.count(F.lit(1)).alias("cluster_size"))
            .select(F.sum("cluster_size"), F.count(F.lit(1)))
            .collect()
        )

    out["full_dup_clusters"] = timed(_full_composition)
    return out


SCALES = {
    "1x": {"events": 3_000_000, "urls": 20_000, "docs": 5_000, "vecs": 2_000},
    "10x": {"events": 30_000_000, "urls": 200_000, "docs": 50_000, "vecs": 20_000},
}


def r6ops_stages(spark, docs) -> dict[str, float]:
    """Round-6 operators: LM train/score, DSIR weight+resample, BPE
    train/encode, token-budget sampling. Expected shapes at 10×: lm_train,
    lm_score, dsir, bpe_encode and the sampler scale with the corpus
    (ratio ≈ 10 on a fixed-core box); bpe_train is vocabulary-bound after
    its one corpus-sized word count (the synthetic vocab is constant
    across scales, so its ratio ≈ 1 — that is the point of training on
    the distinct-word table)."""
    from tslib_spark.functions.text import token_count
    from tslib_spark.operators.bpe import bpe_encode, bpe_train
    from tslib_spark.operators.lm_quality import (
        dsir_log_ratio,
        dsir_resample,
        dsir_weights,
        lm_score,
        ngram_lm_train,
    )
    from tslib_spark.operators.sampling import token_budget_sample

    out = {}
    target = docs.filter(F.col("lang") == "en")
    out["lm_train"] = timed(lambda: _force(ngram_lm_train(target, order=2, min_count=2)))
    lm = ngram_lm_train(target, order=2, min_count=2).persist()
    lm.count()
    out["lm_score"] = timed(lambda: _force(lm_score(docs, lm, order=2)))

    def _dsir():
        ratio = dsir_log_ratio(target, docs, buckets=4096)
        weights = dsir_weights(docs, ratio, buckets=4096)
        dsir_resample(weights, frac=0.3).count()

    out["dsir_weight_resample"] = timed(_dsir)
    out["bpe_train_8"] = timed(
        lambda: bpe_train(docs, num_merges=8, min_pair_count=2), repeats=1
    )
    merges = bpe_train(docs, num_merges=8, min_pair_count=2)
    out["bpe_encode"] = timed(lambda: _force(bpe_encode(docs, merges)))
    toks = docs.withColumn("n_tokens", token_count(F.col("text")))
    total = int(toks.agg(F.sum("n_tokens")).collect()[0][0] or 0)
    out["token_budget_sample"] = timed(
        lambda: _force(
            token_budget_sample(
                toks, "doc_id", "n_tokens", max(1, int(total * 0.3) // 5), strata_col="lang"
            )
        )
    )
    lm.unpersist()
    return out


def run_family(label: str, family: str) -> dict[str, float]:
    cfg = SCALES[label]
    spark = get_spark(
        "scale-evidence", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    try:
        if family == "crawl":
            return crawl_stages(
                spark, cfg["events"], cfg["urls"], f"/tmp/tslib_evidence_pages_{label}"
            )
        if family == "corpus":
            docs = synth_documents(
                spark, cfg["docs"], path=f"/tmp/tslib_evidence_docs_{label}"
            )
            return corpus_stages(spark, docs)
        if family == "embeddings":
            emb = synth_embeddings(
                spark, cfg["vecs"], path=f"/tmp/tslib_evidence_emb_{label}"
            )
            return embedding_stages(spark, emb)
        if family == "r6ops":
            docs = synth_documents(
                spark, cfg["docs"], path=f"/tmp/tslib_evidence_docs_{label}"
            )
            return r6ops_stages(spark, docs)
        raise ValueError(family)
    finally:
        spark.stop()


def _await_window(ref: float, deadline: float, threshold: float = 0.75) -> dict:
    """Block until the ALU probe recovers to ``threshold``×ref or the
    deadline passes; returns the last window note. Keeps a family from
    *starting* inside a window the protocol would immediately attribute
    as degraded."""
    from bench import _window_note

    note = _window_note()
    while note["probe_mops"] < threshold * ref and time.time() < deadline:
        time.sleep(30)
        note = _window_note()
    return note


def main() -> None:
    """Orchestrator: each (scale, family) runs in a FRESH subprocess JVM.

    One long-lived JVM accumulates GC debt and page-cache state across
    stage families — the first recorded run measured the 10× encode at
    87 s in a shared JVM vs 22 s in a fresh one (same code, same heap).
    Per-family isolation makes every stage's number attributable to that
    stage.

    Window discipline (same rationale as bench.py's scaling retry): the
    ALU probe is sampled around every family; a family whose window
    collapsed mid-run (probe < 0.6×ref on either side) is re-run after
    the probe recovers, up to SPARK_GRAFT_EVIDENCE_BUDGET seconds total.
    Degraded attempts are kept verbatim in ``_retries`` — evidence, not
    headline. (A first full recording measured 10× rollup_minute at
    45.9 s in a window whose probe read 3.3 vs 14.0 Mops — 24 % machine
    speed — against 11.6 s in a sane window: without the retry the ratio
    table reads 20.7× for a linear stage.)"""
    import subprocess

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scale_evidence_r5.json"
    from bench import _window_note

    ref = float(os.environ.get("SPARK_GRAFT_PROBE_REF", "12"))
    budget = float(os.environ.get("SPARK_GRAFT_EVIDENCE_BUDGET", "7200"))
    repeats = int(os.environ.get("SPARK_GRAFT_EVIDENCE_REPEATS", "2"))
    start = time.time()
    result: dict = {
        "window_note_start": _window_note(),
        "probe_ref_mops": ref,
        "repeats": repeats,
    }
    here = os.path.abspath(__file__)
    for label, cfg in SCALES.items():
        block: dict = {"config": cfg}
        t0 = time.time()
        for family in ("crawl", "corpus", "embeddings", "r6ops"):
            # min-of-k over time-separated fresh-JVM attempts: this host's
            # degradation includes bandwidth/LLC collapse INVISIBLE to the
            # ALU probe (BENCH.md r4 addendum 2 — one recorded window ran
            # the 10x encode at 154 s vs 38 s for identical code while the
            # probe read a passable 9.0). Minima across attempts separated
            # by minutes are robust to it; the probe gate still skips
            # starting inside an obviously-collapsed window.
            attempts: list[dict] = []
            clean = 0
            while True:
                pre = _await_window(ref, start + budget - 240.0)
                out = subprocess.run(
                    [sys.executable, here, "--family", family, "--scale", label],
                    capture_output=True, text=True, check=True,
                )
                data = json.loads(out.stdout.strip().splitlines()[-1])
                post = _window_note()
                data["_window"] = {"pre": pre, "post": post}
                data["_degraded_window"] = (
                    min(pre["probe_mops"], post["probe_mops"]) < 0.7 * ref
                )
                attempts.append(data)
                clean += 0 if data["_degraded_window"] else 1
                if clean >= repeats or time.time() - start > budget - 600.0:
                    break
            usable = [a for a in attempts if not a["_degraded_window"]] or attempts
            stages = [k for k in usable[0] if not k.startswith("_")]
            chosen: dict = {s: min(a[s] for a in usable) for s in stages}
            chosen["_attempts"] = attempts
            block[family] = chosen
        block["wall_secs"] = round(time.time() - t0, 1)
        result[label] = block

    # stage-by-stage 10x/1x wall ratios (ideal ≈ 10 for CPU-bound stages
    # on a fixed-core box; sublinear stages show where fixed costs sit)
    ratios: dict[str, float] = {}
    for fam in ("crawl", "corpus", "embeddings", "r6ops"):
        for stage, v1 in result["1x"][fam].items():
            if stage.startswith("_"):
                continue
            v10 = result["10x"][fam][stage]
            ratios[f"{fam}.{stage}"] = round(v10 / v1, 2) if v1 > 0 else None
    result["ratio_10x_over_1x"] = ratios
    result["window_note_end"] = _window_note()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"written": out_path, "ratios": ratios}))


if __name__ == "__main__":
    if "--family" in sys.argv:
        fam = sys.argv[sys.argv.index("--family") + 1]
        scale = sys.argv[sys.argv.index("--scale") + 1]
        print(json.dumps(run_family(scale, fam)))
    else:
        main()
