

class TestPackSequences:
    def _pack(self, spark, rows, seq_len=8, n_shards=1):
        from docee_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return pack_sequences(df, seq_len=seq_len, n_shards=n_shards).collect()

    def test_tiling_and_fill_invariants(self, spark):
        """Every sequence except each shard's last is filled to exactly
        seq_len; each document's slices tile [0, n_tok) contiguously;
        empty docs vanish."""
        import collections

        rows = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
                for i, n in [(1, 3), (2, 10), (3, 0), (4, 5), (5, 7)]]
        out = self._pack(spark, rows)
        per_seq = collections.defaultdict(int)
        per_doc = collections.defaultdict(list)
        offs = {}
        for r in out:
            per_seq[r["seq_id"]] += r["tok_end"] - r["tok_start"]
            per_doc[r["doc_id"]].append((r["tok_start"], r["tok_end"]))
            offs[(r["seq_id"], r["doc_id"])] = r["seq_off"]
        assert 3 not in per_doc  # empty doc dropped
        last = max(per_seq)
        assert all(v == 8 for s, v in per_seq.items() if s != last)
        assert sum(per_seq.values()) == 25
        for d, sl in per_doc.items():
            sl.sort()
            assert sl[0][0] == 0
            assert all(a[1] == b[0] for a, b in zip(sl, sl[1:])), (d, sl)
        # within one sequence, slice offsets + widths tile [0, fill)
        by_seq = collections.defaultdict(list)
        for r in out:
            by_seq[r["seq_id"]].append(
                (r["seq_off"], r["seq_off"] + r["tok_end"] - r["tok_start"])
            )
        for s, sl in by_seq.items():
            sl.sort()
            assert sl[0][0] == 0
            assert all(a[1] == b[0] for a, b in zip(sl, sl[1:])), (s, sl)

    def test_long_doc_spans_many_sequences(self, spark):
        rows = [(1, " ".join(f"w{j}" for j in range(25)))]
        out = self._pack(spark, rows)
        slices = sorted((r["seq_id"], r["tok_start"], r["tok_end"]) for r in out)
        assert slices == [(0, 0, 8), (1, 8, 16), (2, 16, 24), (3, 24, 25)]

    def test_sharding_is_md5_deterministic(self, spark):
        import hashlib

        rows = [(i, "a b c") for i in range(20)]
        out = self._pack(spark, rows, n_shards=4)
        for r in out:
            want = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16) % 4
            assert r["shard"] == want
