"""The crawl refinery: raw webtext → clean, deduplicated, decontaminated
corpus → event extraction → KG, as ONE staged resumable job.

Composes the engine's hygiene / quality / dedup / decontamination
operators ahead of the DocEE extraction pipeline, every stage
materialized and committed to the StageStore (parquet + manifest
lineage, Iceberg-emulation semantics) with observable drop counters —
the production shape of a 100 TB Common-Crawl-style training-data +
knowledge-graph build. A rerun over the same input fingerprint resumes
from the manifests and recomputes nothing.

Stage order (the standard webtext-refinery order — cheap, high-yield
gates first so expensive stages see fewer rows):

  clean       robots.txt + domain blocklist + freshest-capture url dedup
  quality     language ID + C4 keep rules + Gopher repetition gate,
              ONE codegen projection (tokenization bound once)
  pii         email/IPv4/phone redaction; scrubbed text FLOWS downstream
  dedup_exact byte-identical content collapse (min-url representative)
  dedup_near  MinHash-LSH candidates → exact-Jaccard verify → keep reps
  decontam    GPT-3/Pile n-gram overlap vs a broadcast eval set
  (extraction)run_pipeline: segment → tag → decode → triples →
              canonicalize → vertex/edge tables (its own staged commits)
  ranks       PageRank over the KG edge table (entity importance)
  audit       HLL distinct-token + histogram length-quantile metrics of
              the refined corpus (long-format (grp, metric, value) —
              constant-size sketch state, one corpus pass)

Scale notes: clean/quality/pii are map-only against the scan (quality is
a single projection — no flag-frame joins); the dedup stages shuffle
only fingerprints/candidates; decontaminate Bloom-prefilters map-side so
only flagged docs explode into the broadcast eval-gram join (exactness
preserved — misses impossible, false positives removed by the join);
the corpus itself crosses an exchange exactly where run_pipeline's
tagger needs its length-bucketed batches.
"""
from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, functions as F

from ..operators.dedup import (
    dedup_keep,
    decontaminate,
    drop_exact_duplicates,
    ensure_parallelism,
    minhash_verified_pairs,
)
from ..operators.textstats import (
    EN_STOPWORDS,
    _gram_stats,
    pii_audit,
    token_ngrams,
    tokens,
)
from .hygiene import clean_crawl
from .ingest import ingest
from .pipeline import StageStore, run_pipeline


def quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    blocklist: tuple[str, ...] = ("lorem", "ipsum"),
    min_tokens: int = 30,
    min_avg_token_len_e2: int = 200,
    max_avg_token_len_e2: int = 1000,
    rep_min_grams: int = 20,
    rep_top_e4: int = 2000,
    payload: bool = False,
    ensure_split: bool = True,
) -> DataFrame:
    """Per-doc quality verdict in ONE codegen projection (no joins):
    language guess (lang_id's rule), C4 keep rules (c4_filters'
    thresholds), and the Gopher top-2-gram repetition gate
    (repetition_scores' stats), all derived from a single bound
    tokenization via the 1-element-array-lambda discipline.

    ``keep`` = (zh ∨ C4-keep) ∧ ¬repetitive — the C4/stopword rules are
    English heuristics, so CJK documents gate on language + repetition
    only (the repetition gate needs ≥ ``rep_min_grams`` 2-grams to fire,
    which whitespace-tokenized CJK never reaches; their quality gate is
    the extraction pipeline itself). All flags are ints and every rule's
    input is also emitted, so drops are observable AND auditable.
    ``payload=True`` carries the input columns through, so a keep-filter
    is a map-side projection of the SAME frame — never a join back.
    ``ensure_split=False`` skips the small-scan round-robin probe: on a
    LAZY mid-pipeline frame the probe's physical-plan inspection
    materializes upstream AQE stages at build time (measured ~18 s of
    un-parallelized work in the sparse refinery) and post-shuffle
    frames are already split — only pass True for committed/file
    inputs."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_cjk = n_chars - F.length(
        F.regexp_replace(c, "[\\x{4e00}-\\x{9fff}]", "")
    )
    packed = F.explode(
        F.transform(
            F.array(tokens(c)),
            lambda tk: F.struct(
                F.size(tk).cast("long").alias("n_tokens"),
                F.aggregate(
                    tk, F.lit(0), lambda acc, t: acc + F.length(t)
                ).cast("long").alias("total_len"),
                F.size(
                    F.filter(tk, lambda t: F.lower(t).isin(*blocklist))
                ).cast("long").alias("blocklist_hits"),
                F.size(
                    F.filter(tk, lambda t: F.lower(t).isin(*EN_STOPWORDS))
                ).cast("long").alias("stop_hits"),
                _gram_stats(token_ngrams(tk, 2)).alias("s2"),
            ),
        )
    )
    carry = [c_ for c_ in docs.columns if c_ != "doc_id"] if payload else []
    out_names = {
        "lang_guess", "n_tokens", "avg_token_len_e2", "blocklist_hits",
        "n_2grams", "top_2gram_frac_e4", "c4_keep", "repetitive", "keep",
    }
    clash = out_names & set(carry)
    if clash:
        raise ValueError(
            f"payload=True: input columns {sorted(clash)} collide with "
            "quality flag outputs — rename them upstream"
        )
    # internal columns carry a _qf_ prefix so payload columns (whatever
    # the source schema holds) can never be ambiguous against them
    base = (ensure_parallelism(docs) if ensure_split else docs).select(
        "doc_id",
        *carry,
        n_chars.alias("_qf_n_chars"),
        n_cjk.alias("_qf_n_cjk"),
        packed.alias("_qf_q"),
    )
    q = F.col("_qf_q")
    n = q["n_tokens"]
    avg = (
        F.when(n > 0, F.floor(q["total_len"] * 100 / n))
        .otherwise(F.lit(0))
        .cast("long")
    )
    s2 = q["s2"]
    top2 = (
        F.when(s2["total"] > 0, F.floor(s2["best"] * 10000 / s2["total"]))
        .otherwise(F.lit(0))
        .cast("long")
    )
    is_zh = (F.col("_qf_n_chars") > 0) & (
        F.col("_qf_n_cjk") * 10 >= F.col("_qf_n_chars")
    )
    lang_guess = (
        F.when(F.col("_qf_n_chars") == 0, F.lit("unk"))
        .when(is_zh, F.lit("zh"))
        .when(q["stop_hits"] > 0, F.lit("en"))
        .otherwise(F.lit("unk"))
    )
    c4_keep = (
        (n >= min_tokens)
        & (avg >= min_avg_token_len_e2)
        & (avg <= max_avg_token_len_e2)
        & (q["blocklist_hits"] == 0)
    )
    repetitive = (s2["total"] >= rep_min_grams) & (top2 > rep_top_e4)
    keep = (is_zh | c4_keep) & ~repetitive
    return base.select(
        "doc_id",
        *carry,
        lang_guess.alias("lang_guess"),
        n.alias("n_tokens"),
        avg.alias("avg_token_len_e2"),
        q["blocklist_hits"].alias("blocklist_hits"),
        s2["total"].alias("n_2grams"),
        top2.alias("top_2gram_frac_e4"),
        c4_keep.cast("int").alias("c4_keep"),
        repetitive.cast("int").alias("repetitive"),
        keep.cast("int").alias("keep"),
    )


def _observe(df: DataFrame, obs: Observation | None, *exprs) -> DataFrame:
    """Attach observed metrics only when the stage actually commits —
    a lazily-fused stage has no single action to observe."""
    return df if obs is None else df.observe(obs, *exprs)


#: checkpoint-granularity preset: skip the HYGIENE-CHAIN intermediates
#: (clean/quality/dedup stay lazy, fused into their consumer) but keep
#: the corpus checkpoints AND the KG materialization — the KG tables are
#: consumed by several downstream actions (ranks, sinks, counts), so
#: leaving extraction lazy recomputes the whole pipeline per consumer
#: (measured: a corpus-only sparse run spent 329 s re-deriving the KG
#: inside the ranks stage at 8 cores — slower than full commit)
SPARSE_COMMIT = frozenset({"pii", "decontam", "extraction"})


def run_refinery(
    web: DataFrame,
    store: StageStore,
    input_fingerprint: str,
    robots: DataFrame | None = None,
    blocked: DataFrame | None = None,
    allowed: DataFrame | None = None,
    eval_df: DataFrame | None = None,
    entity_dict: dict[str, str] | None = None,
    mode: str = "clique",
    n_partitions: int | None = None,
    use_html: bool = False,
    decontam_n: int = 13,
    decontam_prefilter_m_bits: int | None = 1 << 20,
    jaccard_threshold_e4: int = 5000,
    agent: str = "*",
    rank_iters: int = 8,
    commit_stages: frozenset[str] | None = None,
) -> dict:
    """webtext → {triples, vertices, edges, ranks, corpus, counters,
    stage_walls}. Every stage commits to ``store`` under
    ``input_fingerprint``; reruns resume (stage skipped ⇒ wall ≈ 0).

    ``counters`` reports per-stage row counts and drop reasons pulled
    from the committed manifests — no extra Spark actions on resume.

    ``commit_stages`` is the CHECKPOINT-GRANULARITY knob: stages not in
    the set stay LAZY views fused into their consumer (no parquet
    write, no manifest, no Observation counters — and no resume point).
    ``None`` commits everything (maximal resumability).
    ``SPARSE_COMMIT`` keeps the materializations a correct,
    recompute-free plan needs — the pre-dedup corpus (``pii``: consumed
    by BOTH dedup passes and the pair graph), the final corpus
    (``decontam``) and the KG tables (``extraction``: consumed by
    ranks + every sink) — while the hygiene chain fuses map-side into
    the pii commit scan: the full-vs-sparse delta isolates the
    intermediate-stage commit I/O (BENCH.md §refinery)."""
    walls: dict[str, float] = {}
    counters: dict[str, dict] = {}

    def staged(name: str, build, observed: bool = False) -> DataFrame:
        t0 = time.perf_counter()
        if commit_stages is not None and name not in commit_stages:
            # lazy: fuse into the consumer, skip counters (an Observation
            # node consumed by several downstream actions would be
            # ambiguous) — this stage has no resume point by choice
            out = build(None) if observed else build()
        elif store.is_committed(name, input_fingerprint):
            out = store.load(name)
        else:
            if observed:
                obs = Observation(name)
                # counters callable runs AFTER the commit write, when
                # the observed metrics exist — one scan total
                out = store.commit(
                    name,
                    build(obs),
                    input_fingerprint,
                    counters=lambda: {
                        k: float(v or 0) for k, v in obs.get.items()
                    },
                )
            else:
                out = store.commit(name, build(), input_fingerprint)
        walls[name] = round(time.perf_counter() - t0, 2)
        return out

    # 1. crawl hygiene: robots + blocklist + freshest-capture collapse
    clean = staged(
        "clean",
        lambda: clean_crawl(
            web, robots=robots, blocked=blocked, allowed=allowed, agent=agent
        ),
    )

    # 2. quality gate — ONE flag projection, map-side keep filter (the
    # payload rides the flags frame: no join back), drop-reason counters
    # collected DURING the commit scan via Observation (no second pass)
    docs = ingest(clean, use_html=use_html)
    # the split probe is for committed/file scans; on a lazy clean frame
    # it would materialize the hygiene shuffle at plan-build time
    clean_is_scan = commit_stages is None or "clean" in commit_stages

    def build_quality(obs: Observation | None) -> DataFrame:
        flagged = _observe(
            quality_flags(docs, payload=True, ensure_split=clean_is_scan),
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum("keep").alias("n_keep"),
            F.sum((F.col("lang_guess") == "zh").cast("long")).alias("n_zh"),
            F.sum((F.col("blocklist_hits") > 0).cast("long")).alias(
                "n_blocklisted"
            ),
            F.sum("repetitive").alias("n_repetitive"),
        )
        return flagged.filter(F.col("keep") == 1).select(*docs.columns)

    quality = staged("quality", build_quality, observed=True)

    # 3. PII redaction: scrubbed text FLOWS downstream in the same
    # map-only projection that counts residues (pii_audit's sequential
    # rules); counters observed on the commit scan itself
    def build_pii(obs: Observation | None) -> DataFrame:
        counts, red = pii_audit(F.col("text"))
        out_text = (
            F.when(F.col("text").isNull(), F.col("text"))
            .otherwise(red)
            .alias("text")
        )
        cols = [
            out_text if name == "text" else F.col(name)
            for name in quality.columns
        ]
        audited = _observe(
            quality.select(*cols, *counts),
            obs,
            F.sum("n_emails").alias("n_emails"),
            F.sum("n_ips").alias("n_ips"),
            F.sum("n_phones").alias("n_phones"),
        )
        return audited.drop("n_emails", "n_ips", "n_phones")

    pii = staged("pii", build_pii, observed=True)

    # 4a. exact dedup (min-doc_id representative per distinct content)
    exact = staged(
        "dedup_exact", lambda: drop_exact_duplicates(pii, id_col="doc_id")
    )

    # 4b. near-dup dedup: MinHash-LSH candidates → exact-Jaccard verify
    # → connected components → min-id representative
    near = staged(
        "dedup_near",
        lambda: dedup_keep(
            exact,
            minhash_verified_pairs(
                exact, threshold_e4=jaccard_threshold_e4
            ),
        ),
    )

    # 5. benchmark decontamination (GPT-3/Pile 13-gram rule): the drop
    # list is the RARE side, so the corpus anti-joins a broadcast of
    # contaminated ids; the observed count rides the same scan
    if eval_df is not None:

        def build_decontam(obs: Observation | None) -> DataFrame:
            contaminated = _observe(
                decontaminate(
                    near,
                    eval_df,
                    n=decontam_n,
                    # Bloom prefilter: only docs with a Bloom-hit gram
                    # explode into the exact join — output identical
                    # (misses impossible; fps removed by the join), the
                    # O(corpus-tokens) explode shrinks to flagged docs
                    prefilter_m_bits=decontam_prefilter_m_bits,
                )
                .filter(F.col("contaminated") == 1)
                .select("doc_id"),
                obs,
                F.count(F.lit(1)).alias("n_contaminated"),
            )
            return near.join(contaminated, "doc_id", "left_anti")

        decon = staged("decontam", build_decontam, observed=True)
    else:
        decon = near

    # 6. extraction: refined docs back into the webtext (S1) shape; the
    # DocEE pipeline stages commit to the SAME store/fingerprint
    refined = decon.select(
        F.col("doc_id").alias("url"),
        "warc_ts",
        F.lit(None).cast("binary").alias("html"),
        "text",
        "lang",
    )
    t0 = time.perf_counter()
    result = run_pipeline(
        refined,
        entity_dict=entity_dict,
        mode=mode,
        store=(
            store
            if commit_stages is None or "extraction" in commit_stages
            else None
        ),
        input_fingerprint=input_fingerprint,
        use_html=False,
        n_partitions=n_partitions,
    )
    walls["extraction"] = round(time.perf_counter() - t0, 2)

    # 7. entity importance over the materialized KG edges
    from ..operators.linkgraph import pagerank

    result["ranks"] = staged(
        "ranks",
        lambda: pagerank(
            result["edges"].select("src", "dst"), n_iter=rank_iters
        ),
    )

    # 8. corpus audit: sketch-based cardinality + histogram quantiles of
    # the refined corpus, committed as a tiny long-format metrics table
    # (grp, metric, value) — constant-size state (256 HLL registers per
    # lang + one histogram row per bin), so the audit costs one corpus
    # pass however large the build
    def build_audit() -> DataFrame:
        from ..operators.sketches import hll_distinct
        from ..operators.textstats import binned_quantiles

        keyed = decon.select(
            F.col("lang"), F.explode(tokens(F.lower(F.col("text")))).alias("key")
        )
        vocab = hll_distinct(keyed, "key", ["lang"]).select(
            F.col("lang").alias("grp"),
            F.lit("est_distinct_tokens").alias("metric"),
            F.col("est_distinct").alias("value"),
        )
        lens = binned_quantiles(
            decon.select("lang", F.length("text").alias("n_chars")),
            "n_chars",
            ["lang"],
            bin_width=64,
        )
        out = vocab
        for m in ("n_values", "p50", "p90", "p99"):
            out = out.unionByName(
                lens.select(
                    F.col("lang").alias("grp"),
                    F.lit(f"len_{m}").alias("metric"),
                    F.col(m).cast("long").alias("value"),
                )
            )
        return out

    result["audit"] = staged("audit", build_audit)

    for m in store.counters():
        counters[m["stage"]] = {"n_rows": m.get("n_rows"), **m.get("counters", {})}
    result.update(
        {"corpus": decon, "counters": counters, "stage_walls": walls}
    )
    return result
