"""Tests for corpus-pipeline operators (dedup / similarity / textstats /
spans / multimodal) against pure-Python oracles on small synthetic docs."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.functions.hashing import portable_hash32
from searchgov_spider_spark.pipelines import dedup as pdedup
from searchgov_spider_spark.pipelines import multimodal as pmm
from searchgov_spider_spark.pipelines import similarity as psim
from searchgov_spider_spark.pipelines import spans as pspans
from searchgov_spider_spark.pipelines import textstats as pstats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog", "a"),
    (1, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog", "b"),  # exact dup of 0
    (3, "completely different text about spark engines and shuffles", "b"),
    (4, "el gato y el perro y el raton en la casa", "a"),
    (5, "short", "b"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t, s) for i, t, s in DOCS], "doc_id long, text string, source string"
    ).cache()


def _tokens(text):
    return text.strip().split()


def _shingles(text, n=3):
    toks = _tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a, b):
    return len(a & b) / len(a | b)


class TestExactDedup:
    def test_groups(self, docs_df):
        rows = {r["dup_key"]: r for r in pdedup.exact_dup_groups(docs_df).collect()}
        key0 = hashlib.md5(DOCS[0][1].encode()).hexdigest()
        assert rows[key0]["n_docs"] == 2
        assert rows[key0]["keep_doc_id"] == 0
        assert len(rows) == 5  # 6 docs, one pair merged


class TestMinHash:
    def test_signature_matches_python(self, docs_df):
        sigs = {r["doc_id"]: r["sig"] for r in pdedup.minhash_signatures(docs_df).collect()}
        for doc_id, text, _ in DOCS:
            sh = _shingles(text)
            if not sh:
                assert doc_id not in sigs
                continue
            hs = [portable_hash32(s) for s in sh]
            expected = [
                min((a * h + b) % pdedup.MINHASH_PRIME for h in hs)
                for a, b in pdedup.minhash_coeffs(pdedup.MINHASH_PERMS)
            ]
            assert list(sigs[doc_id]) == expected, doc_id

    def test_lsh_finds_near_dup_pair(self, docs_df):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in pdedup.minhash_lsh_pairs(docs_df, threshold=0.4).collect()
        }
        assert (0, 2) in pairs and pairs[(0, 2)] == 1.0  # exact dup
        assert (0, 1) in pairs  # near dup shares most shingles
        exact = _jaccard(_shingles(DOCS[0][1]), _shingles(DOCS[1][1]))
        assert pairs[(0, 1)] == pytest.approx(round(exact, 6))
        assert (0, 3) not in pairs


class TestSimHash:
    def test_simhash_matches_python(self, docs_df):
        sims = {r["doc_id"]: r["simhash"] for r in pdedup.simhash(docs_df).collect()}
        for doc_id, text, _ in DOCS:
            counts = {}
            for t in _tokens(text):
                counts[t] = counts.get(t, 0) + 1
            sig = 0
            for b in range(pdedup.SIMHASH_BITS):
                acc = sum(
                    (cnt if (portable_hash32(t) >> b) & 1 else -cnt) for t, cnt in counts.items()
                )
                if acc > 0:
                    sig |= 1 << b
            assert sims[doc_id] == sig, doc_id

    def test_near_dups_include_exact_pair(self, docs_df):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in pdedup.simhash_near_dups(docs_df, max_hamming=3).collect()
        }
        assert pairs[(0, 2)] == 0

    def test_band_blocking_is_complete(self, docs_df):
        """Band join must find exactly the pairs a cross join finds."""
        sims = {r["doc_id"]: r["simhash"] for r in pdedup.simhash(docs_df).collect()}
        expected = set()
        ids = sorted(sims)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                if bin(sims[a] ^ sims[b]).count("1") <= 3:
                    expected.add((a, b))
        got = {
            (r["doc_a"], r["doc_b"])
            for r in pdedup.simhash_near_dups(docs_df, max_hamming=3).collect()
        }
        assert got == expected


class TestNgramJaccard:
    def test_blocked_pairs(self, docs_df):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in pdedup.ngram_jaccard_pairs(docs_df, block_col="source", threshold=0.1).collect()
        }
        # 0 and 1 share block 'a'; 2 is in block 'b' so (0,2) must NOT appear
        assert (0, 1) in pairs
        assert (0, 2) not in pairs


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        import random

        rng = random.Random(3)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(30)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").cache()

    def test_bruteforce_topk_matches_numpy(self, emb_df):
        import numpy as np

        got = psim.cosine_topk(emb_df, n_queries=3, k=4).collect()
        data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_df.collect()}
        for q in range(3):
            mine = [(r["neighbor_id"], r["cos_sim"]) for r in got if r["query_id"] == q]
            sims = []
            for nid, v in data.items():
                if nid == q:
                    continue
                c = float(np.dot(data[q], v) / (np.linalg.norm(data[q]) * np.linalg.norm(v)))
                sims.append((nid, round(c, 6)))
            sims.sort(key=lambda x: (-x[1], x[0]))
            assert [n for n, _ in mine] == [n for n, _ in sims[:4]]
            for (n1, c1), (n2, c2) in zip(mine, sims[:4]):
                assert c1 == pytest.approx(c2, abs=1e-6)

    def test_pandas_variant_agrees(self, emb_df):
        a = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in psim.cosine_topk(emb_df, n_queries=3, k=4).collect()}
        b = {(r["query_id"], r["rank"]): r["neighbor_id"]
             for r in psim.cosine_topk_pandas(emb_df, n_queries=3, k=4).collect()}
        assert a == b

    def test_lsh_ann_neighbors_share_bucket(self, emb_df):
        got = psim.lsh_ann_topk(emb_df, dim=8, planes=4, n_queries=3, k=4).collect()
        hp = psim.hyperplanes(8, 4)
        data = {r["vec_id"]: r["embedding"] for r in emb_df.collect()}

        def bucket(v):
            code = 0
            for p, w in enumerate(hp):
                if sum(x * y for x, y in zip(v, w)) > 0:
                    code |= 1 << p
            return code

        for r in got:
            assert bucket(data[r["query_id"]]) == bucket(data[r["neighbor_id"]])
            assert r["neighbor_id"] != r["query_id"]



    def test_semdedup_matches_numpy_greedy(self, emb_df):
        import numpy as np

        got = {r.vec_id: r for r in psim.semdedup(emb_df, n_centroids=4, threshold=0.3).collect()}
        data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_df.collect()}

        def cos(a, b):
            return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

        cents = {c: data[c] for c in range(4)}
        assign = {
            i: max(cents, key=lambda c: (cos(v, cents[c]), -c)) for i, v in data.items()
        }
        for i in sorted(data):
            dups = [
                j for j in sorted(data)
                if j < i and assign[j] == assign[i] and cos(data[j], data[i]) >= 0.3
            ]
            assert got[i].cluster_id == assign[i]
            assert got[i].is_kept == (not dups)
            assert got[i].dup_of == (min(dups) if dups else None)

    def test_semdedup_cluster_cap_bounds_pairs(self, emb_df):
        # cap=1: every cluster keeps only its lowest-id member for pair
        # generation, so nothing can be marked dup
        out = psim.semdedup(emb_df, n_centroids=4, threshold=-1.0, max_cluster_size=1)
        assert out.filter("NOT is_kept").count() == 0
        # uncapped at threshold=-1, everything after the cluster's first id is a dup
        out2 = {r.vec_id: r for r in psim.semdedup(emb_df, n_centroids=4, threshold=-1.0).collect()}
        firsts = {}
        for i in sorted(out2):
            c = out2[i].cluster_id
            if c not in firsts:
                firsts[c] = i
                assert out2[i].is_kept
            else:
                assert out2[i].dup_of == firsts[c]

class TestTextStats:
    def test_token_counts(self, spark, docs_df):
        rows = {r["doc_id"]: r for r in pstats.token_counts(docs_df).collect()}
        assert rows[0]["ws_tokens"] == 9
        assert rows[5]["ws_tokens"] == 1

    def test_quality_monotone_and_bounded(self, docs_df):
        rows = {r["doc_id"]: r for r in pstats.quality_features(docs_df).collect()}
        for r in rows.values():
            assert 0.0 <= r["quality_score"] <= 1.0
        # doc 0 has stopword 'the' twice among 9 tokens
        assert rows[0]["stop_ratio"] == pytest.approx(round(2 / 9, 6))

    def test_lang_id(self, docs_df):
        rows = {r["doc_id"]: r["predicted_lang"] for r in pstats.language_id(docs_df).collect()}
        assert rows[0] == "en"
        assert rows[4] == "es"

    def test_lang_id_cjk(self, spark):
        df = spark.createDataFrame([(9, "北京 上海 广州", "x")], "doc_id long, text string, source string")
        assert pstats.language_id(df).collect()[0]["predicted_lang"] == "zh"

    def test_fingerprints_match_python(self, docs_df):
        rows = {r["doc_id"]: r for r in pstats.fingerprints(docs_df).collect()}
        for doc_id, text, _ in DOCS:
            roll = 0
            for t in _tokens(text):
                roll = (roll * pstats.ROLL_MULT + portable_hash32(t)) % pstats.ROLL_MOD
            assert rows[doc_id]["roll_hash"] == roll
            norm = " ".join(text.split()).lower()
            assert rows[doc_id]["content_md5"] == hashlib.md5(norm.encode()).hexdigest()


class TestSpans:
    def test_roundtrip(self, docs_df):
        spanned = pspans.derive_spans(docs_df)
        back = {r["doc_id"]: r["text"] for r in pspans.reassemble_text(spanned).collect()}
        for doc_id, text, _ in DOCS:
            toks = _tokens(text)
            expected = " ".join(t for i, t in enumerate(toks, start=1) if i % 7 != 3)
            assert back[doc_id] == expected

    def test_order_preserved(self, docs_df):
        flat = pspans.flatten_spans(pspans.derive_spans(docs_df)).collect()
        by_doc = {}
        for r in flat:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, rows in by_doc.items():
            offs = [r["offset"] for r in sorted(rows, key=lambda r: r["pos"])]
            assert offs == sorted(offs) == [r["pos"] for r in sorted(rows, key=lambda r: r["pos"])]

    def test_fused_flatten_equals_unfused(self, docs_df):
        unfused = sorted(
            tuple(r) for r in pspans.flatten_spans(pspans.derive_spans(docs_df)).collect()
        )
        fused = sorted(tuple(r) for r in pspans.derive_flat_spans(docs_df).collect())
        assert fused == unfused

    def test_span_stats(self, docs_df):
        stats = {r["doc_id"]: r for r in pspans.span_stats(pspans.derive_spans(docs_df)).collect()}
        toks0 = _tokens(DOCS[0][1])
        n_media = sum(1 for i in range(1, len(toks0) + 1) if i % 7 == 3)
        assert stats[0]["n_media"] == n_media
        assert stats[0]["n_spans"] == len(toks0)
        assert len(stats[0]["media_refs"]) == n_media

    def test_span_integrity(self, spark, docs_df):
        spanned = pspans.derive_spans(docs_df)
        clean = {r["doc_id"]: r for r in pspans.span_integrity(spanned).collect()}
        assert all(r["is_valid"] for r in clean.values())
        assert all(
            r["n_disorder"] == r["n_bad_kind"] == r["n_text_null"]
            == r["n_media_null"] == r["n_conflict"] == 0
            for r in clean.values()
        )
        # Hand-built damage: doc 0 offsets zeroed + unknown kind; doc 13
        # null text span; doc 19 text span carrying a media_ref.
        rows = [
            (0, [("ad", "a", None, 0), ("text", "b", None, 0)]),
            (13, [("text", None, None, 0), ("media", None, "m", 1)]),
            (19, [("text", "x", "http://ads/x.gif", 0)]),
        ]
        df = spark.createDataFrame(
            rows, f"doc_id long, spans {pspans.SPAN_SCHEMA}"
        )
        audit = {r["doc_id"]: r for r in pspans.span_integrity(df).collect()}
        assert not audit[0]["is_valid"] and audit[0]["n_disorder"] == 1 and audit[0]["n_bad_kind"] == 1
        assert audit[13]["n_text_null"] == 1 and audit[13]["n_media_null"] == 0
        assert audit[19]["n_conflict"] == 1 and not audit[19]["is_valid"]

    def test_corrupt_spans_damages_residue_classes(self, docs_df):
        spanned = pspans.derive_spans(docs_df)
        audit = {r["doc_id"]: r for r in pspans.span_integrity(pspans.corrupt_spans(spanned)).collect()}
        # doc 0 hits %11/%13/%17/%19 simultaneously; docs 1-5 hit none.
        assert not audit[0]["is_valid"]
        assert audit[0]["n_disorder"] > 0 and audit[0]["n_text_null"] > 0
        for d in (1, 2, 3, 4, 5):
            assert audit[d]["is_valid"], d

    def test_media_captions_windows(self, docs_df):
        rows = pspans.media_captions(pspans.derive_spans(docs_df), window=3).collect()
        by_key = {(r["doc_id"], r["offset"]): r for r in rows}
        for doc_id, text, _ in DOCS:
            toks = _tokens(text)
            media_pos = [i for i in range(1, len(toks) + 1) if i % 7 == 3]
            got_for_doc = [k for k in by_key if k[0] == doc_id]
            assert len(got_for_doc) == len(media_pos)
            for p in media_pos:
                r = by_key[(doc_id, p - 1)]
                # neighbors within 3 positions, text spans only (pos q is
                # text iff q % 7 != 3), tokens are 1-based positions
                before = [toks[q - 1] for q in range(max(1, p - 3), p) if q % 7 != 3]
                after = [
                    toks[q - 1]
                    for q in range(p + 1, min(len(toks), p + 3) + 1)
                    if q % 7 != 3
                ]
                assert r["caption_before"] == " ".join(before)
                assert r["caption_after"] == " ".join(after)
                assert r["media_ref"].endswith(f"/{p}.png")

    def test_interleave_profile(self, docs_df):
        rows = {r["doc_id"]: r for r in pspans.interleave_profile(pspans.derive_spans(docs_df)).collect()}
        for doc_id, text, _ in DOCS:
            toks = _tokens(text)
            kinds = ["media" if p % 7 == 3 else "text" for p in range(1, len(toks) + 1)]
            r = rows[doc_id]
            assert r["n_spans"] == len(kinds)
            for a, b, col in (("text", "text", "tt"), ("text", "media", "tm"),
                              ("media", "text", "mt"), ("media", "media", "mm")):
                want = sum(1 for i in range(len(kinds) - 1) if kinds[i] == a and kinds[i + 1] == b)
                assert r[col] == want, (doc_id, col)
            runs, cur = [0], 0
            for k in kinds:
                cur = cur + 1 if k == "text" else 0
                runs.append(cur)
            assert r["longest_text_run"] == max(runs)

    def test_truncate_spans_prefix_and_budget(self, docs_df):
        budget, media_cost = 8, 4
        kept = pspans.truncate_spans(
            pspans.derive_spans(docs_df), budget=budget, media_cost=media_cost
        ).collect()
        by_doc = {}
        for r in kept:
            by_doc.setdefault(r["doc_id"], []).append(r)
        flat = pspans.flatten_spans(pspans.derive_spans(docs_df)).collect()
        full = {}
        for r in flat:
            full.setdefault(r["doc_id"], []).append(r)
        for doc_id, rows in full.items():
            rows.sort(key=lambda r: r["pos"])
            cum, want = 0, []
            for r in rows:
                cost = media_cost if r["kind"] == "media" else len(r["text"].split()) or 1
                if cum + cost > budget:
                    break
                cum += cost
                want.append((r["pos"], r["kind"], r["text"], r["media_ref"], r["offset"]))
            got = sorted(
                (r["pos"], r["kind"], r["text"], r["media_ref"], r["offset"])
                for r in by_doc.get(doc_id, [])
            )
            assert got == want, doc_id

    def test_truncate_spans_empty_and_oversized(self, spark):
        spanned = spark.createDataFrame(
            [(1, []), (2, [("media", None, "m.png", 0)])],
            f"doc_id long, spans {pspans.SPAN_SCHEMA}",
        )
        # budget below the single media span's cost -> nothing kept
        assert pspans.truncate_spans(spanned, budget=2, media_cost=4).count() == 0

    def test_media_dedup_refcounts(self, docs_df):
        blobs = {r["content_hash"]: r for r in pspans.dedup_media(pspans.derived_media(docs_df)).collect()}
        # position p (1-based, p % 7 == 3) is a media span; blob identity is
        # the position, so n_docs = #docs with >= p tokens
        pos_docs = {}
        for doc_id, text, _ in DOCS:
            for p in range(1, len(_tokens(text)) + 1):
                if p % 7 == 3:
                    pos_docs.setdefault(p, []).append(doc_id)
        assert len(blobs) == len(pos_docs)
        for p, docs in pos_docs.items():
            h = hashlib.md5(str(p).encode()).hexdigest()
            r = blobs[h]
            assert r["ref_count"] == len(docs) == r["n_docs"] == r["n_refs"]
            assert r["canonical_ref"] == min(
                f"https://cdn.example.gov/{d}/{p}.png" for d in docs
            )

    def test_rewrite_media_refs_roundtrip(self, docs_df):
        spanned = pspans.derive_spans(docs_df)
        blobs = pspans.dedup_media(pspans.derived_media(docs_df))
        mapping = pspans.derived_media(docs_df).select("media_ref", "content_hash").join(
            blobs.select("content_hash", "canonical_ref"), "content_hash"
        ).select("media_ref", "canonical_ref")
        rewritten = {r["doc_id"]: r["spans"] for r in pspans.rewrite_media_refs(spanned, mapping).collect()}
        original = {r["doc_id"]: r["spans"] for r in spanned.collect()}
        canon = {r["media_ref"]: r["canonical_ref"] for r in mapping.collect()}
        assert rewritten.keys() == original.keys()
        for doc_id, spans in original.items():
            got = rewritten[doc_id]
            assert len(got) == len(spans)
            for o, g in zip(spans, got):
                assert (g["kind"], g["text"], g["offset"]) == (o["kind"], o["text"], o["offset"])
                if o["kind"] == "media":
                    assert g["media_ref"] == canon[o["media_ref"]]
                else:
                    assert g["media_ref"] is None


class TestMultimodal:
    def test_meta(self, docs_df):
        rows = {r["doc_id"]: r for r in pmm.binary_meta(pmm.attach_binary(docs_df)).collect()}
        assert rows[0]["n_bytes"] == len(DOCS[0][1].encode())
        assert rows[0]["modality"] == "image"
        assert rows[1]["modality"] == "audio"
        assert rows[2]["modality"] == "video"

    def test_decode_stub_deterministic(self, docs_df):
        feats = {r["doc_id"]: r for r in pmm.decode_media(pmm.attach_binary(docs_df)).collect()}
        n = len(DOCS[0][1].encode())
        assert feats[0]["width"] == 16 + n % 1024
        assert feats[2]["frames"] is not None  # video row

    def test_decode_real_raises(self, docs_df):
        with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
            pmm.decode_media(pmm.attach_binary(docs_df), real=True).collect()

    def test_frame_sample(self, docs_df):
        feats = pmm.decode_media(pmm.attach_binary(docs_df))
        frames = pmm.frame_sample(feats, every_n=100).collect()
        vids = {r["doc_id"] for r in feats.filter(F.col("modality") == "video").collect()}
        assert {r["doc_id"] for r in frames} == vids
        for r in frames:
            assert r["frame_idx"] % 100 == 0


class TestIVF:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(40)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int").cache()

    def test_probe_all_equals_bruteforce(self, emb_df):
        exact = {(r["query_id"], r["rank"]): r["neighbor_id"]
                 for r in psim.cosine_topk(emb_df, n_queries=3, k=4).collect()}
        ivf = {(r["query_id"], r["rank"]): r["neighbor_id"]
               for r in psim.ivf_topk(emb_df, n_centroids=4, n_probe=4, n_queries=3, k=4).collect()}
        assert ivf == exact  # probing every list == exhaustive search

    def test_partial_probe_candidates_from_probed_buckets(self, emb_df):
        cents = psim.train_centroids(emb_df, n_centroids=4)
        got = psim.ivf_topk(emb_df, n_centroids=4, n_probe=1, n_queries=3, k=4,
                            centroids=cents).collect()
        data = {r["vec_id"]: list(r["embedding"]) for r in emb_df.collect()}

        def nearest(v):
            def d(a, b):
                return sum((x - y) ** 2 for x, y in zip(a, b))
            return min(range(len(cents)), key=lambda i: (d(v, cents[i]), i))

        for r in got:
            assert nearest(data[r["neighbor_id"]]) == nearest(data[r["query_id"]])

    def test_centroids_deterministic(self, emb_df):
        a = psim.train_centroids(emb_df, n_centroids=4)
        b = psim.train_centroids(emb_df, n_centroids=4)
        assert a == b


class TestBlockCaps:
    def test_hot_block_bounded(self, spark):
        """A 3000-row hot block under max_block_size=50 yields at most
        C(50,2) pairs and logs the truncation — bounded quadratic work."""
        import pyspark.sql.functions as F

        docs = spark.range(3000).select(
            F.col("id").alias("doc_id"),
            F.lit("hot").alias("source"),
            F.concat(F.lit("alpha beta gamma delta epsilon zeta token"),
                     (F.col("id") % 7).cast("string")).alias("text"),
        )
        pairs = pdedup.ngram_jaccard_pairs(
            docs, threshold=0.0, max_block_size=50
        ).collect()
        assert 0 < len(pairs) <= 50 * 49 // 2
        ids = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
        assert max(ids) < 50  # lowest-id members kept deterministically

    def test_embedding_hot_block_bounded(self, spark):
        import pyspark.sql.functions as F

        emb = spark.range(2000).select(
            F.col("id").alias("vec_id"),
            F.lit(1).alias("label"),
            F.array(F.lit(1.0), (F.col("id") % 3).cast("double")).alias("embedding"),
        )
        pairs = pdedup.embedding_near_dups(
            emb, threshold=0.0, max_block_size=40
        ).collect()
        assert 0 < len(pairs) <= 40 * 39 // 2

    def test_cap_none_is_exact(self, docs_df):
        a = sorted(map(tuple, pdedup.ngram_jaccard_pairs(docs_df, threshold=0.1).collect()))
        b = sorted(map(tuple, pdedup.ngram_jaccard_pairs(docs_df, threshold=0.1, max_block_size=10**6).collect()))
        assert a == b

    def test_sql_twin_mirrors_binding_cap(self, spark, tmp_path):
        """When the cap BINDS, the DuckDB twin truncates the same
        lowest-id block members, so Spark and oracle stay hash-equal."""
        import duckdb
        import pyspark.sql.functions as F

        docs = spark.range(12).select(
            F.col("id").alias("doc_id"),
            F.lit("hot").alias("source"),
            F.concat(
                F.lit("alpha beta gamma delta epsilon zeta tok"),
                (F.col("id") % 3).cast("string"),
            ).alias("text"),
        )
        pq = str(tmp_path / "docs.parquet")
        docs.toPandas().to_parquet(pq)
        got = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in pdedup.ngram_jaccard_pairs(
                docs, threshold=0.0, max_block_size=5
            ).collect()
        )
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
        want = sorted(
            map(
                tuple,
                con.sql(
                    pdedup.ngram_jaccard_pairs_sql(threshold=0.0, max_block_size=5)
                ).fetchall(),
            )
        )
        assert got == want
        assert all(a < 5 and b < 5 for a, b, _ in got)


class TestDupClusters:
    def test_components_resolved(self, spark):
        import pyspark.sql.functions as F

        nodes = spark.range(8).select(F.col("id").alias("doc_id"))
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (4, 5), (6, 7), (5, 6)], "doc_a long, doc_b long"
        )
        got = {r["doc_id"]: r["cluster"] for r in pdedup.dup_clusters(pairs, nodes).collect()}
        # chain 0-1-2 -> 0; chain 4-5-6-7 -> 4; singleton 3 -> itself
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 4, 7: 4}

    def test_driver_and_distributed_paths_identical(self, spark):
        """The bounded driver union-find fast path and the distributed
        min-label loop resolve identical clusters (incl. a long chain
        that needs several propagation rounds)."""
        import pyspark.sql.functions as F

        n = 64
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        # one long chain 0-1-...-40 plus a few separate stars
        rows = [(i, i + 1) for i in range(40)] + [(50, 55), (50, 60), (45, 63)]
        pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
        fast = {
            (r["doc_id"], r["cluster"])
            for r in pdedup.dup_clusters(pairs, nodes).collect()
        }
        dist = {
            (r["doc_id"], r["cluster"])
            for r in pdedup.dup_clusters(pairs, nodes, driver_edge_cap=0).collect()
        }
        assert fast == dist
        assert ({c for d, c in fast if d <= 40} == {0}
                and dict(fast)[55] == 50 and dict(fast)[63] == 45)

    def test_long_chain_converges(self, spark):
        import pyspark.sql.functions as F

        n = 30
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )
        got = {r["doc_id"]: r["cluster"] for r in pdedup.dup_clusters(pairs, nodes).collect()}
        assert all(v == 0 for v in got.values())


def test_pmi_bigrams_matches_python(spark):
    import math as _math
    from collections import Counter
    from searchgov_spider_spark.pipelines.textstats import pmi_bigrams

    texts = [
        "new york new york city hall",
        "new york is a big city",
        "city hall of new york",
        "big city big city big city",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [(r.w1, r.w2, r.n, r.pmi, r.rank) for r in pmi_bigrams(df, k=50, min_count=2).collect()]

    uni, bi = Counter(), Counter()
    for t in texts:
        toks = [w.lower() for w in t.split() if w]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    t_tot = float(sum(uni.values()))
    b_tot = float(sum(bi.values()))
    scored = [
        (w1, w2, n, round(_math.log((n / b_tot) / ((uni[w1] / t_tot) * (uni[w2] / t_tot))), 9))
        for (w1, w2), n in bi.items() if n >= 2
    ]
    scored.sort(key=lambda x: (-x[3], x[0], x[1]))
    want = [(w1, w2, n, pytest.approx(p, abs=1e-9), i + 1) for i, (w1, w2, n, p) in enumerate(scored)]
    assert got == want
    # the collocation "new york" must outrank the frequent-but-independent pairs
    assert got[0][:2] == ("new", "york")


def test_knn_classify_votes(spark):
    from searchgov_spider_spark.pipelines.similarity import knn_classify

    # 2 query vectors + 8 corpus vectors in 2 tight clusters by label
    rows = []
    for i in range(10):
        if i in (0, 5, 6, 7, 8):   # cluster A along x
            vec, label = [1.0, 0.01 * i], 1
        else:                       # cluster B along y
            vec, label = [0.01 * i, 1.0], 2
        rows.append((i, vec, label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.query_id: r for r in knn_classify(df, n_queries=2, k=3).collect()}
    assert set(got) == {0, 1}
    assert got[0].true_label == 1 and got[0].pred_label == 1
    assert got[1].true_label == 2 and got[1].pred_label == 2
    assert got[0].votes == 3  # 5,6,7 or 8 all label-1 neighbors
    assert 1 <= got[1].votes <= 3


def test_typo_pairs_symspell_complete(spark):
    from searchgov_spider_spark.pipelines.cleaning import typo_pairs

    docs = spark.createDataFrame(
        [
            (0, "table table tabl chair"),      # deletion pair
            (1, "chair chairs stool"),          # insertion pair
            (2, "stool spool"),                 # substitution pair
            (3, "microservice monoliths"),      # far apart - no pair
        ],
        "doc_id long, text string",
    )
    got = {(r.w1, r.w2): (r.c1, r.c2, r.dist) for r in typo_pairs(docs).collect()}
    assert ("tabl", "table") in got and got[("tabl", "table")] == (1, 2, 1)
    assert ("chair", "chairs") in got
    assert ("spool", "stool") in got and got[("spool", "stool")][2] == 1
    # no quadratic surprises: far pairs absent
    assert all(d <= 1 for (_, _, d) in got.values())
    assert len(got) == 3


def test_triangle_count_matches_python(spark):
    from itertools import combinations

    from searchgov_spider_spark.pipelines import search as psearch

    docs = spark.createDataFrame([(i, "x") for i in range(17)], "doc_id long, text string")
    (got,) = psearch.triangle_count(docs).collect()
    n = 17
    und = set()
    for s in range(n):
        for a, bb in psearch.PR_EDGE_COEFFS:
            d = (s * a + bb) % n
            if s != d:
                und.add((min(s, d), max(s, d)))
    tri = sum(
        1 for a, b, c in combinations(range(n), 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    )
    assert got.n_triangles == tri


def test_profile_table_one_scan(spark):
    from searchgov_spider_spark.pipelines.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 1.0), (3, None, 2.0), (4, "b", None)],
        "id long, s string, v double",
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["id"].n == 4 and got["id"].n_null == 0 and got["id"].n_distinct == 4
    assert got["s"].n_null == 1 and got["s"].n_distinct == 2
    assert got["v"].n_null == 2 and got["v"].n_distinct == 2


def test_skew_plan_hot_keys_and_salt(spark):
    from searchgov_spider_spark.pipelines.profiling import skew_plan

    rows = [("hot",)] * 25 + [("warm",)] * 11 + [("cold",)] * 4
    df = spark.createDataFrame(rows, "domain string")
    got = {r.key: r for r in skew_plan(df, "domain", target_rows_per_task=10).collect()}
    # only keys with cnt > target are reported
    assert set(got) == {"hot", "warm"}
    assert got["hot"].cnt == 25 and got["hot"].salt_factor == 3  # ceil(25/10)
    assert got["warm"].salt_factor == 2
    assert got["hot"].share_ppm == 25 * 1_000_000 // 40


def test_partition_plan_covers_all_rows(spark):
    from searchgov_spider_spark.functions.hashing import portable_hash32
    from searchgov_spider_spark.pipelines.profiling import partition_plan

    rows = [
        (f"https://d{i % 3}.gov/p/{i}", f"d{i % 3}.gov") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "url string, domain string")
    got = partition_plan(df, 8).collect()
    assert sum(r.n_urls for r in got) == 200
    assert all(1 <= r.n_domains <= 3 for r in got)
    assert sum(r.load_ppm for r in got) <= 1_000_000
    # pid assignment matches the portable hash exactly
    by_pid = {r.pid: r for r in got}
    import collections

    exp = collections.Counter(portable_hash32(u) % 8 for u, _ in rows)
    assert {p: c for p, c in exp.items()} == {r.pid: r.n_urls for r in got}
    assert max(r.max_domain_rows for r in got) <= max(
        collections.Counter(d for _, d in rows).values()
    )


def test_heavy_keys_equals_exact_group_by(spark):
    from collections import Counter

    from searchgov_spider_spark.pipelines.profiling import heavy_keys

    # zipf-ish keys across many partitions; capacity far below cardinality
    rows = [(f"k{i % (i % 7 + 1)}",) for i in range(1, 3000)]
    df = spark.createDataFrame(rows, "domain string").repartition(16)
    for cap in (3, 5, 10):
        got = {(r.key, r.cnt) for r in heavy_keys(df, "domain", capacity=cap).collect()}
        counts = Counter(k for k, in rows)
        n = len(rows)
        exp = {(k, c) for k, c in counts.items() if c * (cap + 1) > n}
        assert got == exp, cap


def test_heavy_keys_no_false_negatives_tiny_capacity(spark):
    from searchgov_spider_spark.pipelines.profiling import heavy_keys

    rows = [("hot",)] * 900 + [(f"u{i}",) for i in range(300)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = heavy_keys(df, "k", capacity=1).collect()
    assert [(r.key, r.cnt) for r in got] == [("hot", 900)]
    assert got[0].share_ppm == 900 * 1_000_000 // 1200


def test_keep_best_prefers_quality_then_lowest_id(spark):
    from searchgov_spider_spark.pipelines.dedup import keep_best

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        "doc_id long, cluster long",
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 7), (5, 3), (6, 3)],
        "doc_id long, q long",
    )
    got = {r.cluster: r for r in keep_best(clusters, quality, "q").collect()}
    assert got[1].keep_doc_id == 2  # highest q, tie broken by lowest id
    assert got[1].n_docs == 3 and got[1].best_quality == 99
    assert got[4].keep_doc_id == 4  # singleton keeps itself
    assert got[5].keep_doc_id == 5  # exact tie -> lowest doc_id


def test_overlap_join_prefix_filter_complete(spark):
    from itertools import combinations

    from searchgov_spider_spark.pipelines.dedup import overlap_join

    # docs over a 12-word vocab with graded overlaps
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (0, " ".join(vocab[0:8])),    # w0..w7
        (1, " ".join(vocab[2:10])),   # w2..w9  -> overlap with 0 = 6
        (2, " ".join(vocab[4:12])),   # w4..w11 -> overlap with 1 = 6, with 0 = 4
        (3, " ".join(vocab[0:8])),    # duplicate of 0 -> overlap 8
        (4, "unique tokens only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.overlap for r in overlap_join(df, min_overlap=6).collect()}
    # brute force oracle
    sets = {i: set(t.split()) for i, t in rows}
    want = {
        (a, b): len(sets[a] & sets[b])
        for a, b in combinations(range(5), 2)
        if len(sets[a] & sets[b]) >= 6
    }
    assert got == want
    assert got[(0, 3)] == 8 and got[(0, 1)] == 6


def test_containment_counts_matches_bruteforce(spark):
    from searchgov_spider_spark.pipelines.dedup import containment_counts

    rows = [
        (0, "a b"),            # contained in 1, 2, 4
        (1, "a b c"),          # contained in 2
        (2, "a b c d"),
        (3, "x y z"),
        (4, "b a"),            # same set as 0 -> contained in 0, 1, 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.set_size, r.n_containers) for r in containment_counts(df).collect()}
    sets = {i: set(t.split()) for i, t in rows}
    want = {
        i: (len(s), sum(1 for j, s2 in sets.items() if j != i and s <= s2))
        for i, s in sets.items()
    }
    assert got == want
    assert got[0] == (2, 3) and got[3] == (3, 0)


class TestWinnowing:
    @staticmethod
    def _py_winnow(text, k=3, w=4):
        toks = _tokens(text)
        grams = [
            portable_hash32(" ".join(toks[i : i + k]))
            for i in range(len(toks) - k + 1)
        ]
        if not grams:
            return set()
        wlen = min(w, len(grams))
        out = set()
        for j in range(len(grams) - wlen + 1):
            window = grams[j : j + wlen]
            mn = min(window)
            # rightmost tie
            rpos = max(q for q, h in enumerate(window, start=1) if h == mn)
            out.add((j + rpos, mn))
        return out

    def test_matches_python(self, docs_df):
        got = {}
        for r in pstats.winnow_fingerprints(docs_df).collect():
            got.setdefault(r["doc_id"], set()).add((r["pos"], r["gram_hash"]))
        for doc_id, text, _ in DOCS:
            expected = self._py_winnow(text)
            assert got.get(doc_id, set()) == expected, doc_id

    def test_short_doc_single_window(self, spark):
        # 4 tokens, k=3 -> 2 grams < w=4 -> one window over both grams
        df = spark.createDataFrame([(0, "a b c d", "x")], "doc_id long, text string, source string")
        rows = pstats.winnow_fingerprints(df).collect()
        assert len(rows) == 1
        assert rows[0]["gram_hash"] == min(
            portable_hash32("a b c"), portable_hash32("b c d")
        )

    def test_below_k_tokens_empty(self, spark):
        df = spark.createDataFrame([(0, "a b", "x")], "doc_id long, text string, source string")
        assert pstats.winnow_fingerprints(df).count() == 0

    def test_shared_run_guarantee(self, spark):
        """Any shared run of >= k + w - 1 tokens shares a fingerprint hash."""
        shared = "alpha beta gamma delta epsilon zeta"  # 6 = k + w - 1
        df = spark.createDataFrame(
            [(0, "x1 x2 " + shared + " x3", "a"), (1, "y1 " + shared + " y2 y3", "b")],
            "doc_id long, text string, source string",
        )
        rows = pstats.winnow_fingerprints(df).collect()
        h0 = {r["gram_hash"] for r in rows if r["doc_id"] == 0}
        h1 = {r["gram_hash"] for r in rows if r["doc_id"] == 1}
        assert h0 & h1


class TestQuantize:
    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        import random

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
        rows.append((20, [0.0] * 8))  # zero vector edge case
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()

    def test_int8_quantization_properties(self, emb_df):
        rows = {r["vec_id"]: r for r in psim.quantize_embeddings(emb_df).collect()}
        data = {r["vec_id"]: r["embedding"] for r in emb_df.collect()}
        for vid, r in rows.items():
            v = [float(x) for x in data[vid]]
            ma = max(abs(x) for x in v)
            assert len(r["q"]) == len(v)
            assert all(-127 <= q <= 127 for q in r["q"])
            if ma == 0:
                assert r["scale_ppb"] == 0 and all(q == 0 for q in r["q"])
                continue
            import math
            assert r["scale_ppb"] == int(math.floor(ma / 127.0 * 1e9 + 0.5))
            # reconstruction error bounded by half a quantization step
            scale = ma / 127.0
            for x, q in zip(v, r["q"]):
                assert abs(q * scale - x) <= scale / 2 + 1e-12


def test_tokenizer_fertility_integer_ppm(spark):
    from searchgov_spider_spark.pipelines import textstats as pstats
    import re

    rows = [(0, "aa bb-cc 12", "s1"), (1, "x", "s1"), (2, "hello, world", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in pstats.tokenizer_fertility(df).collect()}
    for src in ("s1", "s2"):
        docs = [(t) for _, t, s in rows if s == src]
        n_bytes = sum(len(t.encode()) for t in docs)
        ws = sum(len(t.strip().split()) for t in docs)
        re_t = sum(len(re.findall(pstats.REGEX_TOKEN, t)) for t in docs)
        r = got[src]
        assert (r["n_docs"], r["n_bytes"], r["ws_tokens"], r["re_tokens"]) == (len(docs), n_bytes, ws, re_t)
        assert r["bytes_per_token_ppm"] == n_bytes * 1_000_000 // re_t
        assert r["fertility_ppm"] == re_t * 1_000_000 // ws


def test_lang_mixture_shares(spark):
    from searchgov_spider_spark.pipelines import textstats as pstats

    rows = [
        (0, "the of and in is", "a"),      # en, 5 tokens
        (1, "el la los de y que", "a"),    # es, 6 tokens
        (2, "zz qq ww", "a"),              # und, 3 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["predicted_lang"]: r for r in pstats.lang_mixture(df).collect()}
    total = 5 + 6 + 3
    assert got["en"]["n_docs"] == 1 and got["en"]["ws_tokens"] == 5
    assert got["es"]["ws_tokens"] == 6
    assert got["und"]["ws_tokens"] == 3
    for lang, n in (("en", 5), ("es", 6), ("und", 3)):
        assert got[lang]["share_ppm"] == n * 1_000_000 // total


def test_dup_rate_report(spark):
    from searchgov_spider_spark.pipelines import dedup as pdedup

    rows = [
        (0, "same text", "a"),
        (1, "same text", "a"),
        (2, "SAME   text", "a"),  # normalizes equal
        (3, "unique one", "a"),
        (4, "solo", "b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in pdedup.dup_rate_report(df).collect()}
    assert (got["a"]["n_docs"], got["a"]["n_unique"]) == (4, 2)
    assert got["a"]["dup_ppm"] == 2 * 1_000_000 // 4
    assert (got["b"]["n_docs"], got["b"]["n_unique"], got["b"]["dup_ppm"]) == (1, 1, 0)


def test_modality_mix_matches_python(spark):
    from searchgov_spider_spark.pipelines import spans as pspans

    rows = [
        (0, "a b c d e f g h i j", "s1"),   # 10 toks: media at p=3,10 -> 2
        (1, "a b c", "s1"),                  # 3 toks: media at p=3 -> 1
        (2, "a b", "s2"),                    # 2 toks: no media
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.source: r
        for r in pspans.modality_mix(
            pspans.derive_spans(docs, keep=("source",)), target_ppm=150_000
        ).collect()
    }
    # s1: 13 spans total, 3 media
    assert (got["s1"].n_docs, got["s1"].text_spans, got["s1"].media_spans) == (2, 10, 3)
    assert got["s1"].media_share_ppm == 3 * 1_000_000 // 13
    assert got["s1"].dev_from_target_ppm == 3 * 1_000_000 // 13 - 150_000
    # s2: no media at all
    assert (got["s2"].media_spans, got["s2"].media_share_ppm) == (0, 0)
    assert got["s2"].dev_from_target_ppm == -150_000


def test_sketch_eval_counts_match_bruteforce(spark):
    from searchgov_spider_spark.pipelines import dedup as pd2

    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 0
        (2, "one two three four five six seven eight"),
        (3, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = pd2.sketch_eval(docs, n_sample=10, threshold_ppm=500_000).collect()[0]
    # brute force: only (0,1) share >= 50% of 3-gram shingles
    assert r.n_truth == 1
    assert r.n_hit == r.n_candidates  # exact verify: no false positives kept
    assert r.n_hit in (0, 1)
    assert r.recall_ppm == r.n_hit * 1_000_000
    if r.n_candidates:
        assert r.precision_ppm == 1_000_000


def test_span_sequence_equality_classes(spark):
    """Every divergence class surfaces at the exact position: equal
    docs, a text edit, a media_ref swap, a dropped tail span, an extra
    span, an out-of-order-but-identical sequence (equal after the
    offset sort), and docs missing from either side."""
    from searchgov_spider_spark.pipelines.spans import span_sequence_equality

    def span(kind, text, mref, off):
        return (kind, text, mref, off)

    schema = (
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    base = [
        span("text", "a", None, 0), span("text", "b", None, 1),
        span("media", None, "m.png", 2),
    ]
    ours = spark.createDataFrame(
        [
            (1, base),                                    # identical
            (2, base),                                    # text edit @2
            (3, base),                                    # media swap @3
            (4, base),                                    # their tail dropped
            (5, base),                                    # their extra span
            (6, base),                                    # theirs reordered, same content
            (7, base),                                    # missing from theirs
        ],
        schema,
    )
    theirs = spark.createDataFrame(
        [
            (1, base),
            (2, [base[0], span("text", "bX", None, 1), base[2]]),
            (3, [base[0], base[1], span("media", None, "other.png", 2)]),
            (4, base[:2]),
            (5, base + [span("text", "d", None, 3)]),
            (6, [base[2], base[0], base[1]]),             # offset sort restores order
            (8, base),                                    # missing from ours
        ],
        schema,
    )
    out = {r["doc_id"]: r for r in span_sequence_equality(ours, theirs).collect()}
    assert out[1]["equal"] and out[1]["first_mismatch"] == 0
    assert not out[2]["equal"] and out[2]["first_mismatch"] == 2
    assert not out[3]["equal"] and out[3]["first_mismatch"] == 3
    assert not out[4]["equal"] and out[4]["first_mismatch"] == 3  # min(n)+1
    assert not out[5]["equal"] and out[5]["first_mismatch"] == 4
    assert out[6]["equal"], "order comes from offset, not array position"
    assert not out[7]["equal"] and (out[7]["n_theirs"], out[7]["first_mismatch"]) == (0, 1)
    assert not out[8]["equal"] and (out[8]["n_ours"], out[8]["first_mismatch"]) == (0, 1)
    assert set(out) == {1, 2, 3, 4, 5, 6, 7, 8}


def test_audio_segment_plan_geometry(spark):
    """Segment strides, tail clamping, overlap, and sample counts are
    exact integer geometry; non-audio rows are excluded."""
    from searchgov_spider_spark.pipelines.multimodal import audio_segment_plan

    feats = spark.createDataFrame(
        [
            (1, "audio", 70_000),   # 30s windows: [0,30k) [30k,60k) [60k,70k)
            (2, "audio", 30_000),   # exactly one full window
            (3, "audio", 100),      # shorter than a window -> one clamped seg
            (4, "video", 99_000),   # excluded
        ],
        "doc_id long, modality string, duration_ms long",
    )
    rows = {
        (r["doc_id"], r["seg_idx"]): r
        for r in audio_segment_plan(feats, segment_ms=30_000).collect()
    }
    assert {k[0] for k in rows} == {1, 2, 3}
    assert [(rows[(1, i)]["start_ms"], rows[(1, i)]["end_ms"]) for i in range(3)] == [
        (0, 30_000), (30_000, 60_000), (60_000, 70_000)
    ]
    assert rows[(1, 2)]["n_samples"] == 10_000 * 16  # clamped tail at 16 kHz
    assert (rows[(2, 0)]["end_ms"], (2, 1) in rows) == (30_000, False)
    assert (rows[(3, 0)]["end_ms"], rows[(3, 0)]["n_samples"]) == (100, 1600)
    # 50% overlap halves the stride
    olap = audio_segment_plan(
        feats.where("doc_id = 2"), segment_ms=30_000, overlap_ms=15_000
    ).collect()
    assert [r["start_ms"] for r in sorted(olap, key=lambda r: r["seg_idx"])] == [0, 15_000]
