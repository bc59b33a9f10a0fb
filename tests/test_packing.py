"""Sequence packing (pipelines/packing.py): concat-and-chunk placement."""

import pytest

from searchgov_spider_spark.pipelines import packing as pp


@pytest.fixture(scope="module")
def docs(spark):
    # one shard (n_shards=1 in tests) with token counts 5, 10, 3, 130
    rows = [
        (0, "a b c d e"),
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "x y z"),
        (3, " ".join(f"w{i}" for i in range(130))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_chunks_offsets_and_straddle(docs):
    out = {
        r["doc_id"]: r
        for r in pp.pack_chunks(docs, capacity=16, n_shards=1).collect()
    }
    # doc_id order within the single shard: 0(5) 1(10) 2(3) 3(130)
    assert (out[0]["start_off"], out[0]["end_off"]) == (0, 5)
    assert (out[1]["start_off"], out[1]["end_off"]) == (5, 15)
    assert (out[2]["start_off"], out[2]["end_off"]) == (15, 18)
    assert (out[3]["start_off"], out[3]["end_off"]) == (18, 148)
    # chunk placement at capacity 16
    assert (out[0]["first_chunk"], out[0]["last_chunk"]) == (0, 0)
    assert (out[1]["first_chunk"], out[1]["last_chunk"]) == (0, 0)  # ends at tok 14
    assert (out[2]["first_chunk"], out[2]["last_chunk"]) == (0, 1)  # straddles 15..17
    assert (out[3]["first_chunk"], out[3]["last_chunk"]) == (1, 9)  # 18..147


def test_pack_chunks_shards_are_independent(docs):
    out = {
        r["doc_id"]: r
        for r in pp.pack_chunks(docs, capacity=16, n_shards=2).collect()
    }
    # shard 0 gets docs 0,2 — doc 2 now starts right after doc 0
    assert out[0]["shard"] == 0 and out[2]["shard"] == 0
    assert (out[2]["start_off"], out[2]["end_off"]) == (5, 8)
    # shard 1 gets docs 1,3
    assert (out[3]["start_off"], out[3]["end_off"]) == (10, 140)


def test_chunk_stats_fill(docs):
    packed = pp.pack_chunks(docs, capacity=16, n_shards=1)
    row = pp.chunk_stats(packed, capacity=16).collect()[0]
    assert row["n_docs"] == 4 and row["n_tokens"] == 148
    assert row["n_chunks"] == 10  # ceil(148/16)
    assert row["fill_ppm"] == 148 * 1_000_000 // 160  # integer ppm, exact


def test_pii_scrub_redacts_and_counts(spark):
    from searchgov_spider_spark.pipelines import cleaning as pc

    rows = [
        (0, "mail me at jane.doe+x@agency.gov or bob@sub.example.org today"),
        (1, "ssn 078-05-1120 phone 202-555-0199 also 303.555.0100"),
        (2, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pc.pii_scrub(df).collect()}
    assert out[0]["n_emails"] == 2 and "<EMAIL>" in out[0]["clean_text"]
    assert "@" not in out[0]["clean_text"]
    assert out[1]["n_ssns"] == 1 and out[1]["n_phones"] == 2
    assert out[1]["clean_text"] == "ssn <SSN> phone <PHONE> also <PHONE>"
    assert out[2]["clean_text"] == rows[2][1]
    assert out[2]["n_emails"] == out[2]["n_ssns"] == out[2]["n_phones"] == 0


class TestCdcChunks:
    @staticmethod
    def _py_cdc(text, divisor=8):
        from searchgov_spider_spark.functions.hashing import portable_hash32
        from searchgov_spider_spark.pipelines.textstats import ROLL_MOD, ROLL_MULT

        toks = text.strip().split() if text.strip() else [""]
        n = len(toks)
        bounds = [
            i
            for i in range(2, n)  # boundary after token i, never after n
            if portable_hash32(f"{toks[i - 2]} {toks[i - 1]}") % divisor == 0
        ]
        starts = [1] + [b + 1 for b in bounds]
        ends = bounds + [n]
        out = []
        for c, (st, en) in enumerate(zip(starts, ends), start=1):
            roll = 0
            for t in toks[st - 1 : en]:
                roll = (roll * ROLL_MULT + portable_hash32(t)) % ROLL_MOD
            out.append((c, st, en - st + 1, roll))
        return out

    def test_matches_python(self, spark):
        rows = [
            (0, " ".join(f"tok{i % 13}" for i in range(40))),
            (1, "one two"),
            (2, " ".join(f"w{i}" for i in range(100))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {}
        for r in pp.cdc_chunks(df).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["start_pos"], r["n_tokens"], r["chunk_hash"])
            )
        for doc_id, text in rows:
            assert sorted(got[doc_id]) == self._py_cdc(text), doc_id

    def test_chunks_tile_document(self, spark):
        df = spark.createDataFrame(
            [(0, " ".join(f"w{i}" for i in range(64)))], "doc_id long, text string"
        )
        chunks = sorted(
            pp.cdc_chunks(df).collect(), key=lambda r: r["chunk_id"]
        )
        pos = 1
        for r in chunks:
            assert r["start_pos"] == pos
            pos += r["n_tokens"]
        assert pos == 65

    def test_edit_realigns_boundaries(self, spark):
        """After a one-token prefix edit, chunk hashes downstream of the
        first content boundary are identical (the CDC property; fixed-size
        chunking would shift every boundary)."""
        base = " ".join(f"w{i}" for i in range(60))
        df = spark.createDataFrame(
            [(0, base), (1, "EDIT " + base)], "doc_id long, text string"
        )
        rows = pp.cdc_chunks(df).collect()
        h0 = {r["chunk_hash"] for r in rows if r["doc_id"] == 0}
        h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
        assert h0 & h1


def test_pack_spans_multimodal_costs(docs):
    from searchgov_spider_spark.pipelines import spans as ps

    out = {
        r["doc_id"]: r
        for r in pp.pack_spans(
            ps.derive_spans(docs), capacity=16, n_shards=1, media_budget=16
        ).collect()
    }
    # derive_spans: 1-based position p is media iff p % 7 == 3.
    # token counts 5, 10, 3, 130 -> media counts 1, 2, 1, 19
    def cost(n):
        n_media = 0 if n < 3 else (n - 3) // 7 + 1
        return n - n_media + 16 * n_media, n_media

    offs = 0
    for d, n in ((0, 5), (1, 10), (2, 3), (3, 130)):
        c, m = cost(n)
        r = out[d]
        assert (r["n_media"], r["n_text_tokens"], r["cost"]) == (m, n - m, c)
        assert (r["start_off"], r["end_off"]) == (offs, offs + c)
        assert r["first_chunk"] == offs // 16
        assert r["last_chunk"] == (offs + c - 1) // 16
        offs += c


def test_pack_spans_media_budget_zero_matches_text_only(docs):
    from searchgov_spider_spark.pipelines import spans as ps

    # with media_budget equal to 1, every span costs one token, so the
    # placement must equal pack_chunks on the flat text
    sp = pp.pack_spans(ps.derive_spans(docs), capacity=16, n_shards=1, media_budget=1)
    flat = pp.pack_chunks(docs, capacity=16, n_shards=1)
    got = {r["doc_id"]: (r["start_off"], r["end_off"], r["first_chunk"], r["last_chunk"]) for r in sp.collect()}
    want = {r["doc_id"]: (r["start_off"], r["end_off"], r["first_chunk"], r["last_chunk"]) for r in flat.collect()}
    assert got == want
