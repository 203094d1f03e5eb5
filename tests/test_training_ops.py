"""Training-data operators: dedup (exact / minhash-LSH / simhash) and
ANN (brute-force + LSH) over the testdata documents/embeddings."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geo_polygonize_spark.operators.ann import cosine_topk_bruteforce, lsh_cosine_topk
from geo_polygonize_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    shingle_hashes,
    simhash_dedup,
    simhash64,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dupes(spark, docs):
    # deterministic near-dups: copy of each doc with a single appended
    # token, ids offset by 100000; exact dup of doc 0 at id 200000
    near = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" zz")).alias("text"),
    )
    exact = docs.where("doc_id = 0").select(
        F.lit(200000).cast("long").alias("doc_id"), "text"
    )
    return docs.select("doc_id", "text").unionByName(near).unionByName(exact).cache()


class TestDedup:
    def test_exact_dedup(self, docs_with_dupes):
        out = exact_dedup(docs_with_dupes).collect()
        dupes = [r for r in out if r["n_dupes"] > 1]
        assert len(dupes) == 1  # only doc 0 has an exact twin
        assert dupes[0]["keeper"] == 0 and dupes[0]["n_dupes"] == 2

    def test_minhash_lsh_finds_near_dupes(self, docs_with_dupes):
        pairs = minhash_lsh_dedup(
            docs_with_dupes, jaccard_threshold=0.7, num_hashes=64, bands=16
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # every (doc, doc+100000) near-dup pair must be recalled
        n_docs = docs_with_dupes.where("doc_id < 100000").count()
        want = {(i, i + 100000) for i in range(n_docs)}
        recalled = len(want & got) / len(want)
        assert recalled >= 0.95, f"recall {recalled}"
        # jaccard values are genuine (high for near-dups)
        assert all(r["jaccard"] >= 0.7 for r in pairs)

    def test_minhash_is_deterministic(self, docs_with_dupes):
        a = sorted(map(tuple, minhash_lsh_dedup(docs_with_dupes).collect()))
        b = sorted(map(tuple, minhash_lsh_dedup(docs_with_dupes).collect()))
        assert a == b

    def test_simhash_exact_bucket(self, docs_with_dupes):
        out = simhash_dedup(docs_with_dupes).collect()
        buckets = [r for r in out if r["n_dupes"] > 1]
        assert any(r["keeper"] == 0 for r in buckets)  # exact dup shares simhash

    def test_simhash_near_dup_hamming(self, spark, docs):
        # a near-dup's simhash should be within a few bits
        sh = simhash64(docs.select("doc_id", "text")).collect()
        near = simhash64(
            docs.select("doc_id", F.concat("text", F.lit(" zz")).alias("text"))
        ).collect()
        base = {r["doc_id"]: r["simhash"] for r in sh}
        dists = [bin((base[r["doc_id"]] ^ r["simhash"]) & (2**64 - 1)).count("1") for r in near]
        assert np.median(dists) <= 6

    def test_ngram_jaccard_exact(self, spark, docs_with_dupes):
        ids = spark.createDataFrame([(0, 200000), (0, 1)], "id_a long, id_b long")
        out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs_with_dupes, ids).collect()}
        assert out[(0, 200000)] == pytest.approx(1.0)  # exact dup
        assert out[(0, 1)] < 0.9  # different docs


class TestANN:
    def test_bruteforce_matches_numpy(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
        rows = emb.collect()
        mat = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
        ids = np.asarray([r["vec_id"] for r in rows])
        q = [(int(ids[0]), mat[0]), (int(ids[7]), mat[7])]
        got = cosine_topk_bruteforce(emb, q, k=5).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        for qid, qv in q:
            sims = matn @ (qv / np.linalg.norm(qv))
            order = np.lexsort((ids, -sims))[:5]
            mine = sorted(by_q[qid])
            assert [int(ids[i]) for i in order] == [m[1] for m in mine]
            np.testing.assert_allclose(
                [float(sims[i]) for i in order], [m[2] for m in mine], rtol=1e-9
            )

    def test_lsh_recall_vs_bruteforce(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
        rows = emb.collect()
        mat = np.stack([np.asarray(r["embedding"], np.float64) for r in rows])
        ids = [r["vec_id"] for r in rows]
        q = [(int(ids[i]), mat[i]) for i in (0, 3, 11)]
        bf = cosine_topk_bruteforce(emb, q, k=1).collect()
        lsh = lsh_cosine_topk(emb, q, k=1, n_planes=10).collect()
        bf1 = {r["query_id"]: r["neighbor_id"] for r in bf}
        lsh1 = {r["query_id"]: r["neighbor_id"] for r in lsh}
        # top-1 is the query itself (cos=1) and must survive LSH
        # (identical vectors share every bucket)
        assert all(lsh1[k] == bf1[k] for k in bf1)


class TestKeepers:
    def test_connected_keepers_chain(self, spark):
        from geo_polygonize_spark.operators.dedup import connected_keepers

        # chain A~B~C plus an isolated pair and singletons
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 42)], "doc_id long")
        out = {r["doc_id"]: r["keeper"] for r in connected_keepers(pairs, ids).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 42: 42}

    def test_minhash_keepers_end_to_end(self, spark, docs):
        from geo_polygonize_spark.operators.dedup import minhash_dedup_keepers

        d = docs.where("doc_id < 30").select("doc_id", "text")
        near = d.select((F.col("doc_id") + 100000).alias("doc_id"),
                        F.concat("text", F.lit(" zz")).alias("text"))
        out = {r["doc_id"]: r["keeper"]
               for r in minhash_dedup_keepers(d.unionByName(near), jaccard_threshold=0.8).collect()}
        assert len(out) == 60
        for i in range(30):
            # twin collapses onto the original (absent natural chains
            # the keeper is the original id; with chains it is ≤ it)
            assert out[i + 100000] <= i

    def test_minhash_mega_bucket_star_no_blowup(self, spark):
        from geo_polygonize_spark.operators.dedup import minhash_dedup_keepers

        # 2000 identical documents: every band bucket is a mega bucket.
        # All-pairs would be ~2M candidate rows per band; the star cap
        # emits O(n) and the component still collapses to one keeper.
        n = 2000
        d = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("the same exact boilerplate text repeated for every document").alias("text"),
        )
        out = minhash_dedup_keepers(d, jaccard_threshold=0.8, max_bucket=64)
        ks = [r["keeper"] for r in out.collect()]
        assert len(ks) == n and set(ks) == {0}

    def test_simhash_neardup_pairs_exact_recall(self, spark, docs):
        import itertools

        from geo_polygonize_spark.operators.dedup import simhash64, simhash_neardup_pairs

        d = docs.where("doc_id < 120").select("doc_id", "text")
        dup = d.where("doc_id < 25").select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        corpus = d.unionByName(dup)
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in simhash_neardup_pairs(corpus, k=3).collect()}
        # brute-force ground truth over the same simhashes: banding has
        # pigeonhole-exact recall for k<=3, so the sets must be EQUAL
        sh = {r["doc_id"]: r["simhash"] for r in simhash64(corpus).select("doc_id", "simhash").collect()}
        want = {}
        for a, b in itertools.combinations(sorted(sh), 2):
            h = bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want[(a, b)] = h
        assert got == want
        assert len(want) >= 25  # the planted hamming-0 dups are all in


class TestANNSelfJoin:
    def test_lsh_selfjoin_matches_numpy_replication(self, spark):
        from geo_polygonize_spark.operators.ann import lsh_selfjoin_topk

        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = lsh_selfjoin_topk(e, k=2, n_planes=8, dim=64)
        assert "CartesianProduct" not in out._jdf.queryExecution().executedPlan().toString()
        rows = out.collect()

        pdf = e.toPandas()
        V = np.stack([np.asarray(v, np.float64) for v in pdf.embedding])
        ids = pdf.vec_id.to_numpy()
        planes = np.random.default_rng(42).standard_normal((8, 64))
        bits = (V @ planes.T) > 0
        buckets = (bits * (1 << np.arange(8))).sum(axis=1)
        want = {}
        norm = V / np.linalg.norm(V, axis=1, keepdims=True)
        for i in range(len(ids)):
            probe = {int(buckets[i])} | {int(buckets[i]) ^ (1 << b) for b in range(8)}
            cand = [j for j in range(len(ids)) if int(buckets[j]) in probe and j != i]
            if not cand:
                continue
            sims = [(float(norm[i] @ norm[j]), -ids[j], j) for j in cand]
            sims.sort(reverse=True)
            for rank, (_, _, j) in enumerate(sims[:2]):
                want[(int(ids[i]), rank)] = int(ids[j])
        got = {(r["vec_id"], r["rank"]): r["neighbor_id"] for r in rows}
        assert got == want


class TestTextAnalysis:
    def test_analyze_documents(self, spark):
        from geo_polygonize_spark.operators.text import analyze_documents

        d = spark.createDataFrame(
            [
                (0, "the quick fox and the lazy dog of the hill"),
                (1, "der hund und die katze und der vogel ist da"),
                (2, "le chat est sur la table et le lit"),
                (3, ""),
                (4, "one two"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in analyze_documents(d).collect()}
        assert rows[0]["lang_id"] == "en"
        assert rows[1]["lang_id"] == "de"
        assert rows[2]["lang_id"] == "fr"
        assert rows[0]["n_tokens"] == 10
        assert rows[3]["n_tokens"] == 0 and rows[3]["quality"] == 0
        assert rows[4]["n_tokens"] == 2

    def test_fingerprint_is_order_sensitive(self, spark):
        from geo_polygonize_spark.operators.text import analyze_documents

        d = spark.createDataFrame(
            [(0, "ab cd"), (1, "cd ab")], "doc_id long, text string"
        )
        fp = {r["doc_id"]: r["fingerprint"] for r in analyze_documents(d).collect()}
        assert fp[0] != fp[1]  # rolling hash, not a bag hash

    def test_fingerprint_matches_python_fold(self, spark):
        from geo_polygonize_spark.operators.text import M31, analyze_documents

        text = "hello spark"
        h = 0
        for ch in text:
            h = (h * 131 + ord(ch)) % M31
        d = spark.createDataFrame([(0, text)], "doc_id long, text string")
        assert analyze_documents(d).collect()[0]["fingerprint"] == h

    def test_embedding_neardup_pairs_and_keepers(self, spark):
        from geo_polygonize_spark.operators.ann import embedding_neardup_pairs
        from geo_polygonize_spark.operators.dedup import connected_keepers

        e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
        twins = e.where("vec_id < 50").select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        corpus = e.unionByName(twins)
        pairs = embedding_neardup_pairs(corpus, threshold=0.95, n_planes=8, dim=64)
        rows = pairs.collect()
        got = {(r["id_a"], r["id_b"]) for r in rows}
        # identical twins share a bucket deterministically → all found
        assert {(i, i + 100000) for i in range(50)} <= got
        assert all(r["cosine"] >= 0.95 for r in rows)
        ids = corpus.select(F.col("vec_id").alias("doc_id"))
        keepers = {
            r["doc_id"]: r["keeper"]
            for r in connected_keepers(
                pairs.select(F.col("id_a"), F.col("id_b")), ids, id_col="doc_id"
            ).collect()
        }
        for i in range(50):
            assert keepers[i + 100000] == keepers[i] <= i


class TestHotBucketCaps:
    """Round-3 scale guards: degenerate LSH buckets must cost O(m), not
    O(m²), in BOTH embedding self-joins (the minhash band join already
    had the star cap; these mirror it)."""

    def _identical_embeddings(self, spark, n, dim=16):
        v = [float(x) for x in np.linspace(0.1, 1.0, dim)]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*[F.lit(x) for x in v]).alias("embedding")
        )

    def test_embedding_neardup_mega_bucket_star(self, spark):
        from geo_polygonize_spark.operators.ann import embedding_neardup_pairs
        from geo_polygonize_spark.operators.dedup import connected_keepers

        n = 3000  # all-pairs would be ~4.5M rows × (n_planes+1) probes
        corpus = self._identical_embeddings(spark, n)
        pairs = embedding_neardup_pairs(
            corpus, threshold=0.95, n_planes=6, dim=16, max_bucket=64
        )
        # star cap: O(n) pairs, every member connected to the anchor
        rows = pairs.collect()
        assert 0 < len(rows) < 10 * n
        keepers = connected_keepers(
            pairs.select("id_a", "id_b"),
            corpus.select(F.col("vec_id").alias("doc_id")),
        )
        ks = {r["keeper"] for r in keepers.collect()}
        assert ks == {0}

    def test_lsh_selfjoin_mega_bucket_sample(self, spark):
        from geo_polygonize_spark.operators.ann import lsh_selfjoin_topk

        n = 3000
        corpus = self._identical_embeddings(spark, n)
        out = lsh_selfjoin_topk(corpus, k=2, n_planes=6, dim=16, max_bucket=32)
        rows = out.collect()
        # bounded: ≤ k rows per query, and every reported neighbor of an
        # identical-vector corpus has cosine 1
        per_q: dict = {}
        for r in rows:
            per_q.setdefault(r["vec_id"], []).append(r)
            assert abs(r["cosine"] - 1.0) < 1e-12
        assert len(per_q) == n
        assert all(len(v) <= 2 for v in per_q.values())

    def test_connected_keepers_long_chain_pointer_doubling(self, spark):
        from geo_polygonize_spark.operators.dedup import connected_keepers

        # a 512-node path: plain min-label propagation needs 511 rounds;
        # pointer doubling converges in O(log n) ≪ max_iter=25
        n = 512
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        out = connected_keepers(pairs, max_iter=25)
        ks = {r["keeper"] for r in out.collect()}
        assert ks == {0}

    def test_connected_keepers_raises_on_exhaustion(self, spark):
        import pytest

        from geo_polygonize_spark.operators.dedup import connected_keepers

        n = 256
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="no convergence"):
            connected_keepers(pairs, max_iter=2)


class TestPhashNearDup:
    def test_hamming_neardup_exact_recall(self, spark):
        """Generic 64-bit hamming LSH (image-phash dedup): planted
        ≤3-bit twins must ALL be found (pigeonhole-exact recall), and
        the pair set must equal brute force over the fingerprints."""
        import itertools

        from geo_polygonize_spark.operators.dedup import hamming_neardup_pairs

        rng = np.random.default_rng(11)
        vals = rng.integers(-(2**63), 2**63 - 1, size=150, dtype=np.int64)
        rows = [(int(i), int(v)) for i, v in enumerate(vals)]
        # twins at hamming 1..3
        for i in range(30):
            flip = (1 << (i % 60)) | (1 << ((i * 7) % 60) if i % 3 else 0)
            rows.append((1000 + i, int(vals[i] ^ np.int64(flip & ((1 << 63) - 1)))))
        df = spark.createDataFrame(rows, "img_id long, phash long")
        got = {(r["id_a"], r["id_b"]): r["hamming"]
               for r in hamming_neardup_pairs(df, "phash", "img_id", k=3).collect()}
        want = {}
        for (ia, va), (ib, vb) in itertools.combinations(rows, 2):
            h = bin((va ^ vb) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                key = (ia, ib) if ia < ib else (ib, ia)
                want[key] = h
        assert got == want and len(want) >= 30

    def test_hamming_mega_bucket_star(self, spark):
        """5000 identical fingerprints: all-pairs would be 12.5M rows
        per band; the anchor-star cap emits O(n) and every member is
        paired (at hamming 0) with the anchor."""
        from geo_polygonize_spark.operators.dedup import hamming_neardup_pairs

        df = spark.range(5000).select(
            F.col("id").alias("img_id"), F.lit(0x1234567890AB).alias("phash")
        )
        rows = hamming_neardup_pairs(df, "phash", "img_id", k=2, max_bucket=64).collect()
        assert len(rows) == 4999
        assert all(r["id_a"] == 0 and r["hamming"] == 0 for r in rows)

    def test_hamming_mega_bucket_mixed_fingerprints_exact(self, spark):
        """r4 regression (ADVICE r3): a mega band bucket holding
        NON-identical fingerprints must not drop real <=k pairs
        between its non-anchor members. 6 copies of A (ids 0-5) plus
        B=A^bit20 (id 10) and C=A^bit21 (id 11) band-collide into a
        >max_bucket bucket on bands 0/2/3; the (B, C) pair at
        hamming 2 was silently lost by the r3 single-anchor star and
        must now be emitted via the per-fingerprint value anchors."""
        from geo_polygonize_spark.operators.dedup import hamming_neardup_pairs

        A = 0x0123456789ABCDEF
        rows = [(i, A) for i in range(6)] + [(10, A ^ (1 << 20)), (11, A ^ (1 << 21))]
        df = spark.createDataFrame(rows, "img_id long, phash long")
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in hamming_neardup_pairs(
                df, "phash", "img_id", k=3, max_bucket=4
            ).collect()
        }
        want = {(0, j): 0 for j in range(1, 6)}
        want.update({(0, 10): 1, (0, 11): 1, (10, 11): 2})
        assert got == want

    def test_ann_dim_required(self, spark):
        """r4: the implicit .first() dim probe is gone — omitting dim
        raises a descriptive error instead of running a driver job."""
        import pytest

        from geo_polygonize_spark.operators.ann import (
            embedding_neardup_pairs,
            lsh_selfjoin_topk,
        )

        e = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "doc_id long, embedding array<float>"
        )
        with pytest.raises(ValueError, match="dim is required"):
            embedding_neardup_pairs(e, threshold=0.9, n_planes=4)
        with pytest.raises(ValueError, match="dim is required"):
            lsh_selfjoin_topk(e, k=1, n_planes=4)
