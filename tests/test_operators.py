"""Operator unit tests: dedup recall, similarity vs numpy oracle,
multimodal plumbing, textstats edge cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tomorrow")),  # near dup
        (3, "completely different content about spark query engines at scale"),
        (4, ""),  # empty doc edge case
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedup:
    def test_exact_finds_identical(self, near_dup_docs):
        from docee_spark.operators.dedup import exact_duplicates

        clusters = {r["keep_id"]: r["n_docs"] for r in exact_duplicates(near_dup_docs).collect()}
        assert clusters[0] == 2  # docs 0,1 collapse

    def test_minhash_finds_near_dup(self, near_dup_docs):
        from docee_spark.operators.dedup import minhash_lsh_pairs

        pairs = {
            (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(near_dup_docs).collect()
        }
        assert (0, 1) in pairs  # exact dups always collide
        assert not any(3 in p for p in pairs)  # distinct doc never pairs

    def test_ngram_jaccard_scores(self, near_dup_docs):
        from docee_spark.operators.dedup import ngram_jaccard_pairs

        rows = ngram_jaccard_pairs(near_dup_docs, threshold_e4=1000).collect()
        j = {(r["doc_a"], r["doc_b"]): r["jaccard_e4"] for r in rows}
        assert j[(0, 1)] == 10000  # identical
        assert 1000 <= j[(0, 2)] < 10000  # near dup scores below exact

    def test_simhash_identical_docs_equal(self, near_dup_docs):
        from docee_spark.operators.dedup import simhash_duplicates

        rows = simhash_duplicates(near_dup_docs).collect()
        by_keep = {r["keep_id"]: r["n_docs"] for r in rows}
        # exact dups 0,1 always share a simhash; near-dup 2 may too (that
        # is the point of simhash); distinct doc 3 must not
        assert by_keep[0] >= 2
        assert by_keep.get(3, 1) == 1

    def test_grouped_cosine_fast_path_matches_jvm(self, spark, monkeypatch):
        """r6: integral vectors take the bucket-local numpy matmul path —
        it must be row-identical to the JVM self-join + cosine_e6 HOF
        path on every edge (null vec, null element, zero vector, mixed
        lengths, threshold 0)."""
        import numpy as np

        import docee_spark.operators.dedup as D

        rng = np.random.RandomState(11)
        rows = []
        for i in range(120):
            dim = 12 if i % 7 else 6
            v = [int(x) for x in rng.randint(-10000, 10000, size=dim)]
            if i % 31 == 0:
                v = [0] * dim
            if i % 37 == 0:
                v[0] = None
            rows.append((i, None if i % 41 == 0 else v))
        base = [int(x) for x in rng.randint(-10000, 10000, size=12)]
        rows += [(200, base), (201, [x + 1 for x in base])]
        df = spark.createDataFrame(rows, "vec_id long, qvec array<long>")
        # the semantic input must be NULL-free: ivf_assign's JVM
        # expression rejects null-ish vectors identically on both paths
        clean = [
            (i, v)
            for i, v in rows
            if v is not None and len(v) == 12 and None not in v
        ]
        df_s = spark.createDataFrame(clean, "vec_id long, qvec array<long>")
        cents = rng.randint(-10000, 10000, size=(3, 12)).astype(np.int64)

        def canon(d):
            return sorted(tuple(r) for r in d.collect())

        for thr in (300_000, 0):
            fast_e = canon(
                D.embedding_cosine_pairs(
                    df, threshold_e6=thr, vec_col="qvec", n_sign_bits=6
                )
            )
            fast_s = canon(
                D.semantic_dup_pairs(df_s, cents, threshold_e6=thr, vec_col="qvec")
            )
            monkeypatch.setattr(D, "_is_integral_vec", lambda *a: False)
            slow_e = canon(
                D.embedding_cosine_pairs(
                    df, threshold_e6=thr, vec_col="qvec", n_sign_bits=6
                )
            )
            slow_s = canon(
                D.semantic_dup_pairs(df_s, cents, threshold_e6=thr, vec_col="qvec")
            )
            monkeypatch.undo()
            assert fast_e == slow_e
            assert fast_s == slow_s

    def test_embedding_cosine_pairs(self, spark):
        from docee_spark.operators.dedup import embedding_cosine_pairs

        v = [1.0, 0.5, 0.25, 0.1, 0.9, 0.3]
        rows = [
            (0, v),
            (1, [x * 1.0001 for x in v]),  # same direction → cosine ≈ 1
            (2, [0.2, -1.0, 0.4, -0.3, 0.1, -0.8]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = embedding_cosine_pairs(df, threshold_e6=990_000).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}

    def test_semantic_dup_pairs(self, spark):
        """SemDeDup drop rule: within a cluster, the over-threshold pair
        drops the member CLOSER to the centroid; singleton clusters never
        pair; equidistant ties drop the greater id."""
        import numpy as np

        from docee_spark.operators.dedup import semantic_dup_pairs

        centroids = np.array([[10000, 0], [0, 10000]], dtype=np.int64)
        rows = [
            # cluster 0: 1 is closer to the centroid than 2 → drop 1
            (1, [10000, 0]),
            (2, [9000, 4000]),
            # cluster 1: singleton, never paired
            (3, [0, 10000]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, qvec array<long>")
        got = semantic_dup_pairs(
            df, centroids, threshold_e6=800_000, vec_col="qvec"
        ).collect()
        assert [(r["id_a"], r["id_b"], r["drop_id"]) for r in got] == [(1, 2, 1)]

        # tie: both members equidistant from the centroid → drop greater id
        tie = spark.createDataFrame(
            [(5, [9000, 4000]), (6, [9000, -4000])],
            "vec_id long, qvec array<long>",
        )
        got = semantic_dup_pairs(
            tie, centroids, threshold_e6=500_000, vec_col="qvec"
        ).collect()
        assert [(r["id_a"], r["id_b"], r["drop_id"]) for r in got] == [(5, 6, 6)]

    def test_semantic_dup_pairs_cluster_cap(self, spark):
        """An over-cap hot cluster is excluded from pairing entirely."""
        import numpy as np

        from docee_spark.operators.dedup import semantic_dup_pairs

        centroids = np.array([[10000, 0]], dtype=np.int64)
        rows = [(i, [10000, i]) for i in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, qvec array<long>")
        got = semantic_dup_pairs(
            df, centroids, threshold_e6=0, vec_col="qvec", max_cluster=4
        ).collect()
        assert got == []


class TestSimilarity:
    def test_bruteforce_matches_numpy(self, spark):
        rng = np.random.RandomState(3)
        vecs = rng.randn(40, 16).astype("float64")
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, vecs[i].tolist()) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        from docee_spark.operators.similarity import brute_force_topk

        out = brute_force_topk(df, df.filter(F.col("vec_id") < 3), k=5).collect()
        got = {}
        for r in out:
            got.setdefault(r["query_id"], []).append(r["neighbor_id"])
        sims = vecs @ vecs.T
        for q in range(3):
            order = [
                i for i in np.lexsort((np.arange(40), -np.floor(sims[q] * 1e6)))
                if i != q
            ][:5]
            assert got[q] == order, (q, got[q], order)

    def test_lsh_recall_within_bucket(self, spark):
        # vectors in the same orthant must find each other via LSH
        rows = [
            (0, [1.0, 1.0, 1.0, 0.5]),
            (1, [0.9, 1.1, 0.8, 0.4]),
            (2, [-1.0, -1.0, -1.0, -0.5]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        from docee_spark.operators.similarity import lsh_topk

        out = lsh_topk(df, df, k=2, n_bits=4).collect()
        got = {(r["query_id"], r["neighbor_id"]) for r in out}
        assert (0, 1) in got and (1, 0) in got
        assert not any(q == 2 or n == 2 for q, n in got if (q, n) != (2, 2))


class TestMultiProbe:
    """Multi-probe sign-LSH: boundary vectors (tiny |value| on a bucketing
    dimension) land on opposite sides of a hyperplane; probing the
    Hamming-1 bucket of the closest hyperplane recovers them."""

    def _boundary_corpus(self, spark):
        base = [0.6, 0.5, 0.4, 0.3]
        rows = []
        for i in range(6):
            shift = [x + 0.01 * i for x in base]
            rows.append((2 * i, [0.001] + shift))       # bit0 = 1
            rows.append((2 * i + 1, [-0.001] + shift))  # bit0 = 0
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_dedup_pairs_recall(self, spark):
        from docee_spark.operators.dedup import embedding_cosine_pairs

        df = self._boundary_corpus(spark)
        expected = {(2 * i, 2 * i + 1) for i in range(6)}
        got0 = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_pairs(
                df, threshold_e6=990_000, n_sign_bits=5, probe_flips=0
            ).collect()
        }
        got1 = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_pairs(
                df, threshold_e6=990_000, n_sign_bits=5, probe_flips=1
            ).collect()
        }
        assert not expected & got0  # sign blocking misses every boundary pair
        assert expected <= got1     # one probe recovers them all
        assert got0 <= got1         # multi-probe is a strict superset

    def test_probe_flips_target_real_dims_when_bits_exceed_vector(self, spark):
        """n_bits > vector length: phantom dimensions (|value| treated as
        0) used to win every flip slot, spending all probes on bits no
        vector differs in. Flips must target the smallest-|value| REAL
        dimension — here dim 0 of a 4-dim vector bucketed at 16 bits."""
        from pyspark.sql import functions as F

        from docee_spark.operators.similarity import probe_buckets, sign_bucket

        df = spark.createDataFrame(
            [(1, [0.001, 0.5, 0.4, 0.3])], "vec_id long, embedding array<double>"
        )
        row = df.select(
            sign_bucket(F.col("embedding"), 16).alias("base"),
            probe_buckets(F.col("embedding"), 16, 1).alias("probes"),
        ).collect()[0]
        assert row["probes"][0] == row["base"]
        # the single flip targets dim 0 (the boundary dim), not dim 4+
        assert row["probes"][1] == row["base"] ^ 1

    def test_dedup_pairs_recall_wide_bits_narrow_vectors(self, spark):
        """End-to-end regression: the boundary-pair recovery above must
        also hold when n_sign_bits exceeds the embedding length (the
        dedup default is 16 bits; these vectors are 5-dim)."""
        from docee_spark.operators.dedup import embedding_cosine_pairs

        df = self._boundary_corpus(spark)
        expected = {(2 * i, 2 * i + 1) for i in range(6)}
        got = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_pairs(
                df, threshold_e6=990_000, n_sign_bits=16, probe_flips=1
            ).collect()
        }
        assert expected <= got

    def test_lsh_topk_recall_vs_brute_force(self, spark):
        from docee_spark.operators.similarity import brute_force_topk, lsh_topk

        df = self._boundary_corpus(spark)
        queries = df.filter(F.col("vec_id") % 2 == 0)
        truth = {
            r.query_id: r.neighbor_id
            for r in brute_force_topk(df, queries, k=1).collect()
        }

        def recall(probe_flips):
            got = {
                r.query_id: r.neighbor_id
                for r in lsh_topk(
                    df, queries, k=1, n_bits=5, probe_flips=probe_flips
                ).collect()
            }
            return sum(got.get(q) == n for q, n in truth.items()) / len(truth)

        r0, r1 = recall(0), recall(1)
        assert r1 == 1.0       # probing the nearest hyperplane finds true NN
        assert r0 < r1         # and strictly improves on single-probe

    @pytest.mark.slow  # e2e sweep; full suite covers it
    def test_recall_curves_monotone_sf0001(self, spark):
        """Regression floor for the BENCH.md recall curves: more probes →
        candidate superset → recall never decreases, and IVF at
        nprobe=n_centroids is exhaustive (recall 1.0)."""
        import numpy as np

        from docee_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
            lsh_topk,
            train_ivf_centroids,
        )

        em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = em.filter(F.col("vec_id") < 16)

        def sets(rows):
            out = {}
            for r in rows:
                out.setdefault(r.query_id, set()).add(r.neighbor_id)
            return out

        truth = sets(brute_force_topk(em, queries, k=3).collect())

        def recall(got):
            return sum(len(truth[q] & got.get(q, set())) for q in truth) / sum(
                len(truth[q]) for q in truth
            )

        lsh = [
            recall(sets(lsh_topk(em, queries, k=3, n_bits=6, probe_flips=p).collect()))
            for p in (0, 1, 2)
        ]
        assert lsh[0] <= lsh[1] <= lsh[2]

        vecs = np.array(
            [r.embedding for r in em.select("embedding").collect()], dtype=np.float64
        )
        cents = train_ivf_centroids(np.round(vecs * 10000).astype(np.int64))
        ivf = [
            recall(sets(ivf_topk(em, queries, cents, k=3, nprobe=p).collect()))
            for p in (1, 4, len(cents))
        ]
        assert ivf[0] <= ivf[1] <= ivf[2]
        assert ivf[-1] == 1.0  # full probe = exact


class TestMultimodal:
    def test_feature_extraction_plumbing(self, spark):
        from docee_spark.operators.multimodal import MEDIA_SCHEMA, extract_features

        rows = [
            ("m1", "image", b"\x89PNGfake", 64, 64, None),
            ("m2", "audio", b"RIFFfake", None, None, 2000),
            ("m3", "image", None, None, None, None),  # null media
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {r["media_id"]: r["features"] for r in extract_features(df, dim=8).collect()}
        assert set(out) == {"m1", "m2", "m3"}
        assert all(len(v) == 8 for v in out.values())
        # deterministic: same bytes → same features
        out2 = {r["media_id"]: r["features"] for r in extract_features(df, dim=8).collect()}
        assert out == out2

    def test_real_decode_unknown_codec_raises(self):
        from docee_spark.operators.multimodal import real_decode

        # JPEG/PNG/audio need an injected decoder; built-ins are BMP/PPM
        with pytest.raises(NotImplementedError):
            real_decode("image", b"\x89PNGfake")
        with pytest.raises(NotImplementedError):
            real_decode("audio", b"RIFFfake")

    def test_builtin_codec_roundtrip(self):
        from docee_spark.operators.multimodal import (
            _decode_bmp,
            _decode_ppm,
            encode_bmp,
            encode_ppm,
            image_stat_features,
        )

        for w, h in [(5, 3), (4, 4), (7, 2), (1, 1)]:  # odd widths hit BMP padding
            rgb = bytes((j * 7 + 3) % 256 for j in range(w * h * 3))
            assert _decode_bmp(encode_bmp(w, h, rgb)) == (w, h, rgb)
            assert _decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)
            expected = [
                float(w), float(h), float(w * h),
                float(sum(rgb[0::3])), float(sum(rgb[1::3])), float(sum(rgb[2::3])),
            ]
            assert image_stat_features(encode_bmp(w, h, rgb)) == expected
            assert image_stat_features(encode_ppm(w, h, rgb)) == expected

    def test_builtin_codec_edge_cases(self):
        import struct

        from docee_spark.operators.multimodal import (
            _decode_bmp,
            _decode_ppm,
            encode_bmp,
            image_stat_features,
        )

        # PPM comments in header
        assert _decode_ppm(b"P6\n# c\n3 2\n255\n" + bytes(range(18))) == (
            3, 2, bytes(range(18)),
        )
        # top-down BMP (negative height) decodes to the same logical rows
        w, h = 3, 2
        rgb = bytes(range(w * h * 3))
        up = bytearray(encode_bmp(w, h, rgb))
        stride = (w * 3 + 3) & ~3
        off = struct.unpack_from("<I", up, 10)[0]
        rows = [bytes(up[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
        struct.pack_into("<i", up, 22, -h)  # flag top-down
        top_down = bytes(up[:off]) + b"".join(reversed(rows))
        assert _decode_bmp(top_down) == (w, h, rgb)
        # truncated pixel data is an error, not garbage features
        with pytest.raises(ValueError):
            _decode_bmp(encode_bmp(4, 4, bytes(48))[:-20])
        with pytest.raises(ValueError):
            _decode_ppm(b"P6\n4 4\n255\n\x00\x01")
        # unsupported variants are explicit NotImplementedError
        with pytest.raises(NotImplementedError):
            _decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))
        with pytest.raises(NotImplementedError):
            image_stat_features(b"GIF89a")

    def test_real_decode_used_in_extract(self, spark):
        from docee_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            encode_bmp,
            encode_ppm,
            extract_features,
        )

        rgb = bytes((j * 11) % 256 for j in range(5 * 3 * 3))
        rows = [
            ("bmp1", "image", encode_bmp(5, 3, rgb), 5, 3, None),
            ("ppm1", "image", encode_ppm(5, 3, rgb), 5, 3, None),
        ]
        df = spark.createDataFrame(rows, MEDIA_SCHEMA)
        out = {
            r["media_id"]: r["features"]
            for r in extract_features(df, use_fake=False).collect()
        }
        assert out["bmp1"] == out["ppm1"]
        assert out["bmp1"][:3] == [5.0, 3.0, 15.0]

    def test_injected_decoder_used(self, spark):
        from docee_spark.operators import multimodal as mm

        mm.set_decoder("image", lambda b: [float(len(b))] * 4)
        try:
            df = spark.createDataFrame(
                [("m1", "image", b"abcd", None, None, None)], mm.MEDIA_SCHEMA
            )
            out = mm.extract_features(df, dim=4).collect()[0]["features"]
            assert out == [4.0, 4.0, 4.0, 4.0]
        finally:
            mm._DECODERS.clear()

    def test_frame_sample_plan(self, spark):
        from docee_spark.operators.multimodal import MEDIA_SCHEMA, frame_sample_plan

        df = spark.createDataFrame(
            [("v1", "video", b"x", None, None, 3500), ("i1", "image", b"y", 1, 1, None)],
            MEDIA_SCHEMA,
        )
        rows = frame_sample_plan(df, every_ms=1000).collect()
        assert [(r["media_id"], r["ts_ms"]) for r in rows] == [
            ("v1", 0), ("v1", 1000), ("v1", 2000), ("v1", 3000),
        ]


class TestTextstatsEdge:
    def test_empty_doc_all_zero(self, spark):
        from docee_spark.operators.textstats import quality_scores

        df = spark.createDataFrame([(1, "")], "doc_id long, text string")
        r = quality_scores(df).collect()[0]
        assert (r["n_tokens"], r["stopword_ratio_e4"], r["punct_ratio_e4"]) == (0, 0, 0)

    def test_rolling_hash_matches_python(self, spark):
        from docee_spark.operators.textstats import rolling_hash

        text = "hello world 你好"
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = df.select(rolling_hash(F.col("text")).alias("h")).collect()[0]["h"]
        # NB: F.split(text, '') yields one element per character; ascii()
        # returns the codepoint of the first char (unicode-aware in Spark 4)
        h = 0
        for ch in text:
            h = (h * 31 + ord(ch)) % 1_000_000_007
        assert got == h


class TestRepetitionFilters:
    """Gopher-style repetition, C4-style keep rules, vocab top-k —
    hand-computed goldens + edge cases."""

    def test_repetition_hand_computed(self, spark):
        from docee_spark.operators.textstats import repetition_scores

        # tokens: a b a b a  → 2-grams: [a b, b a, a b, b a] (4 total;
        # 'a b'×2, 'b a'×2 → top=2/4=0.5, dup=4/4=1.0)
        #           3-grams: [a b a, b a b, a b a] (3; top 2/3, dup 2/3)
        df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
        r = repetition_scores(df).collect()[0]
        assert r["n_2grams"] == 4
        assert r["top_2gram_frac_e4"] == 5000
        assert r["dup_2gram_frac_e4"] == 10000
        assert r["n_3grams"] == 3
        assert r["top_3gram_frac_e4"] == 6666
        assert r["dup_3gram_frac_e4"] == 6666

    def test_repetition_all_unique_and_short(self, spark):
        from docee_spark.operators.textstats import repetition_scores

        df = spark.createDataFrame(
            [(1, "w x y z"), (2, "solo"), (3, "")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in repetition_scores(df).collect()}
        # all-unique 2-grams: top = 1/3 ≈ 3333, dup = 0
        assert rows[1]["n_2grams"] == 3
        assert rows[1]["top_2gram_frac_e4"] == 3333
        assert rows[1]["dup_2gram_frac_e4"] == 0
        # fewer tokens than n → zero n-grams, zero ratios (not NaN/null)
        for d in (2, 3):
            assert rows[d]["n_2grams"] == 0
            assert rows[d]["top_2gram_frac_e4"] == 0
            assert rows[d]["dup_3gram_frac_e4"] == 0

    def test_c4_flags(self, spark):
        from docee_spark.operators.textstats import c4_filters

        long_ok = " ".join(["token"] * 40) + "."
        short = "too short doc"
        blocked = " ".join(["word"] * 40) + " lorem extra"
        df = spark.createDataFrame(
            [(1, long_ok), (2, short), (3, blocked)],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in c4_filters(df).collect()}
        assert rows[1]["keep"] == 1 and rows[1]["ends_with_punct"] == 1
        assert rows[2]["keep"] == 0  # under the token floor
        assert rows[3]["keep"] == 0 and rows[3]["blocklist_hits"] == 1

    def test_vocab_topk_deterministic_ties(self, spark):
        from docee_spark.operators.textstats import vocab_topk

        df = spark.createDataFrame(
            [(1, "b a b a c"), (2, "c d")], "doc_id long, text string"
        )
        rows = vocab_topk(df, k=3).collect()
        # counts: a=2 b=2 c=2 d=1 → top-3 is the a/b/c tie broken
        # alphabetically, in (n desc, token asc) order
        assert [(r["token"], r["n"]) for r in rows] == [("a", 2), ("b", 2), ("c", 2)]


class TestChunkDedup:
    """C4-style cross-corpus span dedup: first occurrence wins, docs
    reassembled from surviving chunks."""

    def test_first_occurrence_wins_and_reassembly(self, spark):
        from docee_spark.operators.dedup import chunk_dedup

        shared = "a b c d"  # one full window at window=4
        df = spark.createDataFrame(
            [
                (1, shared + " e f g h"),     # chunks: [a b c d][e f g h]
                (2, shared + " x y z w"),     # [a b c d] dup → dropped
                (3, "p q r s " + shared),     # [p q r s][a b c d] dropped
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in chunk_dedup(df, window=4).collect()}
        assert rows[1]["clean_text"] == "a b c d e f g h"
        assert rows[1]["n_dropped"] == 0
        assert rows[2]["clean_text"] == "x y z w"
        assert rows[2]["n_dropped"] == 1
        assert rows[3]["clean_text"] == "p q r s"
        assert (rows[3]["n_chunks"], rows[3]["n_dropped"]) == (2, 1)

    def test_partial_tail_window_and_within_doc_dup(self, spark):
        from docee_spark.operators.dedup import chunk_dedup

        # 6 tokens at window=4 → one full + one 2-token tail chunk;
        # doc 2 repeats its own window → within-doc dedup also applies
        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "k l m n k l m n")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in chunk_dedup(df, window=4).collect()}
        assert rows[1]["clean_text"] == "a b c d e f"
        assert rows[1]["n_chunks"] == 2
        assert rows[2]["clean_text"] == "k l m n"
        assert rows[2]["n_dropped"] == 1

    def test_all_dropped_doc_keeps_row_empty_text(self, spark):
        from docee_spark.operators.dedup import chunk_dedup

        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in chunk_dedup(df, window=4).collect()}
        assert rows[2]["clean_text"] == "" and rows[2]["n_dropped"] == 1


class TestSourceStats:
    def test_rollup_with_exact_dups(self, spark):
        from docee_spark.operators.textstats import source_stats

        df = spark.createDataFrame(
            [
                (1, "x y z", "host-a"),
                (2, "x  y z ", "host-a"),  # whitespace-normalized dup
                (3, "u v", "host-a"),
                (4, "only one", "host-b"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {r["source"]: r for r in source_stats(df).collect()}
        assert rows["host-a"]["n_docs"] == 3
        assert rows["host-a"]["n_exact_dups"] == 1
        assert rows["host-a"]["n_tokens"] == 8
        assert rows["host-b"]["n_exact_dups"] == 0


class TestPiiScrub:
    def test_counts_and_sequential_masking(self, spark):
        from docee_spark.operators.textstats import pii_scrub

        df = spark.createDataFrame(
            [
                (1, "mail bob.smith+x@sub.example.org now"),
                (2, "server at 192.168.0.1 and 10.0.0.255 up"),
                (3, "call +1-555-0100 or +44-20-7946-0958"),
                (4, "clean document no pii here"),
                # the digits/dots inside an email must not re-count as
                # IP/phone once the email is masked (sequential rules)
                (5, "a1.2.3.4@h5.example.com"),
                (6, None),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (1, 0, 0)
        assert (rows[2]["n_emails"], rows[2]["n_ips"]) == (0, 2)
        assert rows[3]["n_phones"] == 2
        assert (rows[4]["n_emails"], rows[4]["n_ips"], rows[4]["n_phones"]) == (0, 0, 0)
        assert (rows[5]["n_emails"], rows[5]["n_ips"], rows[5]["n_phones"]) == (1, 0, 0)
        assert rows[6]["n_emails"] == 0  # null text → zero counts, not -1

    def test_redacted_fingerprint_masks_match(self, spark):
        import hashlib

        from docee_spark.operators.textstats import pii_scrub

        df = spark.createDataFrame(
            [(1, "write a@b.co or ping 1.2.3.4 or +1-555-0100 end")],
            "doc_id long, text string",
        )
        expect = "write <EMAIL> or ping <IP> or <PHONE> end"
        row = pii_scrub(df).collect()[0]
        assert row["redacted_fp"] == hashlib.md5(expect.encode()).hexdigest()


class TestDecontaminate:
    def test_planted_overlap_flags_only_contaminated(self, spark):
        from docee_spark.operators.dedup import decontaminate

        evald = spark.createDataFrame(
            [(100, "the quick brown fox jumps")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                (1, "copy of the quick brown fox here"),  # shares 3-grams
                (2, "completely unrelated text tokens"),
                (3, "quick brown fox appears again"),      # one shared gram
                (4, "fox the brown quick"),                # right words, wrong order
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r for r in decontaminate(corpus, evald, n=3).collect()
        }
        # doc 1: "the quick brown","quick brown fox" overlap (not "brown fox here")
        assert rows[1]["n_contaminated"] == 2 and rows[1]["contaminated"] == 1
        assert rows[2]["n_contaminated"] == 0 and rows[2]["contaminated"] == 0
        assert rows[3]["n_contaminated"] == 1
        assert rows[4]["contaminated"] == 0  # n-grams are order-sensitive
        assert rows[2]["n_grams"] == 2  # 4 tokens → 2 distinct 3-grams

    def test_distinct_grams_counted_once_and_short_docs(self, spark):
        from docee_spark.operators.dedup import decontaminate

        evald = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c a b c a b c"), (2, "a b")],  # repeat + sub-n doc
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r for r in decontaminate(corpus, evald, n=3).collect()
        }
        # repeated "a b c" collapses to distinct grams; only distinct overlap counts
        assert rows[1]["n_contaminated"] == 1
        assert rows[2]["n_grams"] == 0 and rows[2]["contaminated"] == 0

    def test_plan_broadcasts_eval_grams(self, spark):
        from docee_spark.operators.dedup import decontaminate

        evald = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        df = decontaminate(corpus, evald, n=3)
        explained = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # both the gram join and the count join-back must be broadcast —
        # the corpus side never shuffles for a join
        assert explained.count("BroadcastHashJoin") >= 2


class TestDecontaminatePrefilter:
    def test_prefiltered_row_identical_to_plain(self, spark):
        """prefilter_m_bits must never change the answer: at saturating
        m (=8, nearly every gram a Bloom fp) the exact join still
        removes every false positive; at generous m the prefilter is a
        pure volume cut. Row-identical in both regimes."""
        from docee_spark.operators.dedup import decontaminate

        evald = spark.createDataFrame(
            [(100, "the quick brown fox jumps"), (101, "a b c d")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "copy of the quick brown fox here"),
                (2, "completely unrelated text tokens"),
                (3, "quick brown fox appears again"),
                (4, "fox the brown quick"),
                (5, "x y a b c d z"),
                (6, "a b"),
            ],
            "doc_id long, text string",
        )
        plain = sorted(
            map(tuple, decontaminate(corpus, evald, n=3).collect())
        )
        for m in (8, 1 << 16):
            pre = sorted(
                map(
                    tuple,
                    decontaminate(
                        corpus, evald, n=3, prefilter_m_bits=m
                    ).collect(),
                )
            )
            assert pre == plain, m

    def test_prefilter_keeps_broadcast_shape(self, spark):
        """The prefilter adds a map-side exists() filter, nothing else:
        still 2× BroadcastHashJoin, still no corpus exchange."""
        from docee_spark.operators.dedup import decontaminate

        evald = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        df = decontaminate(corpus, evald, n=3, prefilter_m_bits=1 << 10)
        explained = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert explained.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in explained
        assert "Exchange hashpartitioning" not in explained


class TestDecontaminateFuzzy:
    def test_planted_near_dup_scored_and_thresholded(self, spark):
        """A near-copy scores high Jaccard and flags; a one-gram brush
        scores low and does NOT flag; a clean doc gets NULL best match,
        score 0. All scores exact bigint floor(|∩|·10⁶/|∪|)."""
        from docee_spark.operators.dedup import decontaminate_fuzzy

        evald = spark.createDataFrame(
            [(100, "the quick brown fox jumps over the lazy dog")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                # grams 1..7 of the eval doc (7 of its 7+… ) — near-dup
                (1, "the quick brown fox jumps over the lazy dog indeed"),
                (2, "a quick brown fox of another kind"),  # 1 shared gram
                (3, "completely unrelated text tokens here"),
            ],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: r
            for r in decontaminate_fuzzy(corpus, evald, n=3).collect()
        }
        # doc 1: 10 tokens → 8 distinct grams, 7 shared with eval's 7:
        # J = 7 / (8 + 7 − 7) = 7/8 → 875000
        assert rows[1]["jaccard_e6"] == 875_000
        assert rows[1]["best_eval_id"] == 100 and rows[1]["contaminated"] == 1
        # doc 2: shares only "quick brown fox": J = 1/(5+7−1) → 90909
        assert rows[2]["jaccard_e6"] == 90_909
        assert rows[2]["contaminated"] == 0  # below tau = 0.1
        assert rows[3]["best_eval_id"] is None
        assert rows[3]["jaccard_e6"] == 0 and rows[3]["contaminated"] == 0

    def test_best_eval_tie_breaks_to_smallest_id_and_tau(self, spark):
        """Two eval docs at identical Jaccard → smallest eval_id wins,
        deterministically; raising tau past the score unflags."""
        from docee_spark.operators.dedup import decontaminate_fuzzy

        evald = spark.createDataFrame(
            [(20, "b c d"), (10, "a b c")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [(1, "a b c d")], "doc_id long, text string"
        )
        row = decontaminate_fuzzy(corpus, evald, n=3).collect()[0]
        # J vs both evals = 1/(2+1−1) = 0.5; tie → eval 10
        assert row["best_eval_id"] == 10 and row["jaccard_e6"] == 500_000
        assert row["contaminated"] == 1
        strict = decontaminate_fuzzy(corpus, evald, n=3, tau_e6=600_000)
        assert strict.collect()[0]["contaminated"] == 0

    def test_plan_keeps_two_broadcast_shape(self, spark):
        """Same skeleton as `decontaminate`: eval grams and the per-doc
        best both reach the corpus as broadcasts — no sort-merge join
        ever forms against the corpus (the tiny match stream may
        exchange for its two groupBys; the corpus must not)."""
        from docee_spark.operators.dedup import decontaminate_fuzzy

        evald = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        df = decontaminate_fuzzy(corpus, evald, n=3)
        explained = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert explained.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in explained


class TestDecontaminateBloom:
    def test_exact_at_low_load_and_superset_always(self, spark):
        """At generous m the Bloom answer equals the exact one; at ANY m
        flagged must be a superset of contaminated (one-sided error)."""
        from docee_spark.operators.dedup import decontaminate, decontaminate_bloom

        evald = spark.createDataFrame(
            [(100, "the quick brown fox jumps")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                (1, "copy of the quick brown fox here"),
                (2, "completely unrelated text tokens"),
                (3, "quick brown fox appears again"),
                (4, "fox the brown quick"),
            ],
            "doc_id long, text string",
        )
        exact = {
            r["doc_id"]: r for r in decontaminate(corpus, evald, n=3).collect()
        }
        generous = {
            r["doc_id"]: r
            for r in decontaminate_bloom(
                corpus, evald, n=3, m_bits=1 << 16
            ).collect()
        }
        for d, x in exact.items():
            assert generous[d]["n_grams"] == x["n_grams"]
            assert generous[d]["n_bloom_hits"] == x["n_contaminated"]
            assert generous[d]["flagged"] == x["contaminated"]
        # tiny filter → saturated → false positives allowed, misses never
        for m in (16, 64):
            tiny = {
                r["doc_id"]: r
                for r in decontaminate_bloom(
                    corpus, evald, n=3, m_bits=m
                ).collect()
            }
            for d, x in exact.items():
                assert tiny[d]["n_bloom_hits"] >= x["n_contaminated"]
                assert tiny[d]["flagged"] >= x["contaminated"]

    def test_deterministic_across_runs(self, spark):
        """False positives come from md5 lanes, not a seeded RNG — two
        independent builds produce byte-identical outputs."""
        from docee_spark.operators.dedup import decontaminate_bloom

        evald = spark.createDataFrame(
            [(9, "a b c d e f g h")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [(i, f"w{i} x{i} a b c y{i} z{i}") for i in range(20)],
            "doc_id long, text string",
        )
        a = sorted(
            map(tuple, decontaminate_bloom(corpus, evald, n=3, m_bits=32).collect())
        )
        b = sorted(
            map(tuple, decontaminate_bloom(corpus, evald, n=3, m_bits=32).collect())
        )
        assert a == b

    def test_scoring_plan_is_map_only(self, spark):
        """The whole point vs `decontaminate`: corpus scoring carries NO
        join and NO exchange of any kind — one literal, pure codegen."""
        from docee_spark.operators.dedup import decontaminate_bloom

        evald = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
        corpus = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id long, text string"
        )
        df = decontaminate_bloom(corpus, evald, n=3, m_bits=1 << 10)
        explained = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "Join" not in explained
        assert "Exchange" not in explained


class TestSampling:
    def test_hash_sample_deterministic_and_monotone(self, spark):
        from docee_spark.operators.sampling import hash_sample

        df = spark.createDataFrame(
            [(i,) for i in range(400)], "doc_id long"
        )
        a = {r["doc_id"] for r in hash_sample(df, 2500, salt="s").collect()}
        b = {r["doc_id"] for r in hash_sample(df, 2500, salt="s").collect()}
        assert a == b  # reproducible, unlike df.sample()
        # a higher rate with the same salt is a SUPERSET (coordinated splits)
        big = {r["doc_id"] for r in hash_sample(df, 7500, salt="s").collect()}
        assert a <= big
        # rate lands near expectation (md5 is uniform)
        assert 50 <= len(a) <= 150 and 250 <= len(big) <= 350
        # a different salt draws a different sample
        c = {r["doc_id"] for r in hash_sample(df, 2500, salt="t").collect()}
        assert a != c

    def test_stratified_rates_respected(self, spark):
        from docee_spark.operators.sampling import stratified_sample

        df = spark.createDataFrame(
            [(i, "hi" if i % 2 == 0 else "lo") for i in range(600)],
            "doc_id long, q string",
        )
        out = stratified_sample(
            df, {"hi": 10000, "lo": 0}, bucket_col="q"
        ).collect()
        assert len(out) == 300 and all(r["q"] == "hi" for r in out)

    def test_mixture_cap_greedy_boundary(self, spark):
        from docee_spark.operators.sampling import mixture_cap

        df = spark.createDataFrame(
            [
                (1, "a b c", "s1"),        # cum 3  (< 7 before: 0)  kept
                (2, "d e f g", "s1"),      # cum 7  (before 3 < 7)   kept
                (3, "h i", "s1"),          # before 7, not < 7       dropped
                (4, "x " * 50, "s2"),      # first doc over budget   kept
                (5, "y", "s2"),            # before 50, dropped
            ],
            "doc_id long, text string, source string",
        )
        rows = {
            r["doc_id"]: r
            for r in mixture_cap(df, {"s1": 7, "s2": 10}).collect()
        }
        assert [rows[i]["kept"] for i in (1, 2, 3)] == [1, 1, 0]
        # the doc that CROSSES the budget is kept (budgets are floors)
        assert rows[4]["kept"] == 1 and rows[5]["kept"] == 0
        assert rows[3]["cum_toks"] == 9


class TestDropExactDuplicates:
    def test_keeps_min_id_per_content(self, spark):
        from docee_spark.operators.dedup import drop_exact_duplicates

        rows = [
            ("u3", "same content"),
            ("u1", "same content"),
            ("u2", "other content"),
        ]
        df = spark.createDataFrame(rows, "url string, text string")
        out = sorted(r["url"] for r in drop_exact_duplicates(df).collect())
        assert out == ["u1", "u2"]

    def test_whitespace_normalized_content_collapses(self, spark):
        from docee_spark.operators.dedup import drop_exact_duplicates

        rows = [("a", "x  y"), ("b", "x y ")]
        df = spark.createDataFrame(rows, "url string, text string")
        assert drop_exact_duplicates(df).count() == 1


class TestDedupSkewGuards:
    """100 TB scale-hardening: hot buckets are capped (never expanded) and
    the drops are observable, not silent."""

    def test_hot_shingle_capped_and_counted(self, spark):
        from pyspark.sql import Observation

        from docee_spark.operators.dedup import ngram_jaccard_pairs

        # 200 docs all sharing one boilerplate shingle ("all rights
        # reserved x"), otherwise unique — uncapped this is 200·199/2
        # pairs from one key; capped it must complete with zero pairs.
        rows = [
            (i, f"unique token{i} number{i} all rights reserved")
            for i in range(200)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = ngram_jaccard_pairs(docs, threshold_e4=100, max_df=50)
        assert pairs.count() == 0

    def test_minhash_bucket_cap_drops_hot_band(self, spark):
        from docee_spark.operators.dedup import minhash_lsh_pairs

        rows = [(i, "exactly the same text for everyone") for i in range(100)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # all 100 docs collide in every band; cap 10 → no pair survives
        assert minhash_lsh_pairs(docs, max_bucket=10).count() == 0
        # and with a generous cap the pairs come back
        assert minhash_lsh_pairs(docs, max_bucket=128).count() == 100 * 99 // 2

    def test_minhash_verified_filters_false_positives(self, near_dup_docs):
        from docee_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_verified_pairs,
        )

        cand = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(near_dup_docs).collect()
        }
        verified = {
            (r["doc_a"], r["doc_b"]): r["jaccard_e4"]
            for r in minhash_verified_pairs(
                near_dup_docs, threshold_e4=5000
            ).collect()
        }
        assert set(verified) <= cand
        assert verified[(0, 1)] == 10000  # identical docs: jaccard 1.0
        # every surviving pair meets the threshold by construction
        assert all(v >= 5000 for v in verified.values())


class TestSimhash64:
    def test_identical_docs_distance_zero(self, near_dup_docs):
        from docee_spark.operators.dedup import simhash_near_duplicates

        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_near_duplicates(near_dup_docs).collect()
        }
        assert pairs.get((0, 1)) == 0

    def test_pigeonhole_matches_bruteforce(self, spark):
        """Banded candidates + popcount verify must equal the brute-force
        Hamming≤3 pair set (pigeonhole guarantee: ≤3 flipped bits leave
        ≥1 of 4 sections intact)."""
        import itertools

        from docee_spark.operators.dedup import simhash64_cols, simhash_near_duplicates

        rows = [
            (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
            for i in range(40)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        secs = {
            r["doc_id"]: (r["s0"], r["s1"], r["s2"], r["s3"])
            for r in docs.select(
                "doc_id",
                *[c.alias(f"s{i}") for i, c in enumerate(simhash64_cols(F.col("text")))],
            ).collect()
        }

        def ham(a, b):
            return sum(bin(x ^ y).count("1") for x, y in zip(secs[a], secs[b]))

        want = {
            (a, b)
            for a, b in itertools.combinations(sorted(secs), 2)
            if ham(a, b) <= 3
        }
        got = {
            (r["doc_a"], r["doc_b"])
            for r in simhash_near_duplicates(docs, max_hamming=3).collect()
        }
        assert got == want


class TestIvfAnn:
    def test_recall_vs_bruteforce(self, spark):
        """IVF with nprobe=4 of 8 clusters must recover most exact top-3
        neighbors (recall ≥ 0.6 on random unit vectors — the documented
        ANN trade-off; raising nprobe → 1.0)."""
        import numpy as np

        from docee_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
            train_ivf_centroids,
        )

        rng = np.random.default_rng(3)
        vecs = rng.normal(size=(300, 16))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        em = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        )
        cents = train_ivf_centroids(
            np.round(vecs * 10000).astype(np.int64), n_centroids=8
        )
        queries = em.filter("vec_id < 10")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(em, queries, k=3).collect()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(em, queries, cents, k=3, nprobe=4).collect()
        }
        assert len(approx & exact) / len(exact) >= 0.6
        # full probing == exact ranking (integer dot ties aside)
        full = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(em, queries, cents, k=3, nprobe=8).collect()
        }
        assert full == exact

    def test_centroid_training_deterministic(self):
        import numpy as np

        from docee_spark.operators.similarity import train_ivf_centroids

        rng = np.random.default_rng(5)
        q = np.round(rng.normal(size=(100, 8)) * 10000).astype(np.int64)
        a = train_ivf_centroids(q, n_centroids=4)
        b = train_ivf_centroids(q, n_centroids=4)
        assert np.array_equal(a, b)


class TestUrlDedup:
    """canonical_url normalization grammar + freshest-capture dedup
    (stages/ingest.py) — the recrawl-collapse step of a Common-Crawl
    ingest (url, warc_ts shape from the north-rule input hint)."""

    CASES = [
        # case-fold scheme+host, keep path case
        ("HTTP://ExAmple.COM/Path/X", "http://example.com/Path/X"),
        # www + default port stripped per scheme
        ("https://www.example.com:443/a", "https://example.com/a"),
        ("http://www.example.com:80/a", "http://example.com/a"),
        # non-default port kept
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        # :443 is NOT default for http
        ("http://example.com:443/a", "http://example.com:443/a"),
        # empty path -> /
        ("https://example.com", "https://example.com/"),
        # fragment dropped, incl. a '?' hiding inside the fragment
        ("https://example.com/a#frag?x=1", "https://example.com/a"),
        # tracking params dropped, remainder sorted; empty query dropped
        (
            "https://example.com/a?utm_source=t&b=2&a=1&gclid=z",
            "https://example.com/a?a=1&b=2",
        ),
        ("https://example.com/a?utm_campaign=x", "https://example.com/a"),
        # ref= is tracking, but a param merely *containing* ref is not
        ("https://example.com/a?ref=top&pref=1", "https://example.com/a?pref=1"),
        # no scheme: passthrough untouched (garbage stays distinct)
        ("not a url", "not a url"),
        ("example.com/a?utm_source=x", "example.com/a?utm_source=x"),
    ]

    def test_canonicalization_grammar(self, spark):
        from docee_spark.stages.ingest import canonical_url

        df = spark.createDataFrame(
            [(u,) for u, _ in self.CASES], "url string"
        ).withColumn("canon", canonical_url(F.col("url")))
        got = {r["url"]: r["canon"] for r in df.collect()}
        for raw, want in self.CASES:
            assert got[raw] == want, (raw, got[raw], want)

    def test_freshest_capture_and_ties(self, spark):
        from docee_spark.stages.ingest import url_dedup

        rows = [
            # one page, three captures: newest wins
            ("https://e.com/a?utm_source=1", "2024-01-01 00:00:00"),
            ("https://WWW.e.com/a", "2024-03-01 00:00:00"),
            ("https://e.com/a#x", "2024-02-01 00:00:00"),
            # tie on ts: url desc wins deterministically
            ("https://e.com/b", "2024-01-01 00:00:00"),
            ("https://www.e.com/b", "2024-01-01 00:00:00"),
            # NULL ts loses to any non-null
            ("https://e.com/c?z=1", None),
            ("https://e.com/c?z=1&utm_source=k", "2020-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "url string, ts string").select(
            "url", F.col("ts").cast("timestamp").alias("warc_ts")
        )
        out = {r["canonical_url"]: r for r in url_dedup(df).collect()}
        assert len(out) == 3
        a = out["https://e.com/a"]
        assert a["url"] == "https://WWW.e.com/a" and a["n_captures"] == 3
        b = out["https://e.com/b"]
        assert b["url"] == "https://www.e.com/b"  # 'w' > 'e' tie-break
        c = out["https://e.com/c?z=1"]
        assert c["url"] == "https://e.com/c?z=1&utm_source=k"
        assert c["n_captures"] == 2
