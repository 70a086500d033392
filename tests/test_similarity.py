"""Tests for operators/similarity.py: brute-force cosine top-k vs a numpy
oracle, LSH ANN recall, and near-dup pair detection."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_glm_spark.operators import similarity as S

DIM = 16
N = 120


@pytest.fixture(scope="module")
def vectors():
    # Clustered data (12 centers x 10 points): LSH assumes neighborhood
    # structure; on isotropic Gaussian noise no hashing scheme beats chance.
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((12, DIM))
    X = np.vstack(
        [c + 0.15 * rng.standard_normal((10, DIM)) for c in centers]
    ).astype(np.float32)
    # plant a near-duplicate of vector 0
    X[1] = X[0] + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    return X


@pytest.fixture(scope="module")
def emb_df(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_cosine(a, b):
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_expr_matches_numpy(spark, vectors, emb_df):
    a = emb_df.where(F.col("vec_id") == 0).select(F.col("embedding").alias("a"))
    b = emb_df.where(F.col("vec_id") == 5).select(F.col("embedding").alias("b"))
    v = (
        a.crossJoin(b)
        .select(S.cosine_expr(F.col("a"), F.col("b")).alias("c"))
        .first()["c"]
    )
    assert v == pytest.approx(_np_cosine(vectors[0], vectors[5]), abs=1e-12)


def test_brute_force_topk_matches_numpy(spark, vectors, emb_df):
    k = 5
    queries = emb_df.where(F.col("vec_id") < 3)
    got = S.brute_force_topk(emb_df, queries, k=k).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    Xd = vectors.astype(np.float64)
    Xn = Xd / np.linalg.norm(Xd, axis=1, keepdims=True)
    for q in range(3):
        cos = Xn @ Xn[q]
        cos[q] = -np.inf
        expect = list(np.argsort(-cos)[:k])
        assert by_q[q] == expect


def test_lsh_ann_recall(spark, emb_df, vectors):
    """ANN with few planes must recover most true neighbors (recall@5)."""
    k = 5
    queries = emb_df.where(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb_df, queries, k=k).collect()
    approx = S.lsh_ann_topk(emb_df, queries, k=k, n_planes=6).collect()
    truth: dict[int, set] = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found: dict[int, set] = {}
    for r in approx:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(truth[q] & found.get(q, set())) / k for q in truth
    ]
    # 6 planes + Hamming-1 multiprobe: 7/64 of bucket space probed per query
    assert np.mean(recalls) >= 0.5


def test_ivf_ann_recall(spark, emb_df, vectors):
    """IVF with nprobe=3 of 12 cells must recover most true neighbors on
    clustered data (the quantizer cells track the planted centers)."""
    k = 5
    queries = emb_df.where(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb_df, queries, k=k).collect()
    approx = S.ivf_ann_topk(emb_df, queries, k=k, n_centroids=12, nprobe=3).collect()
    truth: dict[int, set] = {}
    for r in exact:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    found: dict[int, set] = {}
    for r in approx:
        found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(truth[q] & found.get(q, set())) / k for q in truth]
    assert np.mean(recalls) >= 0.6


class TestProductQuantization:
    """Round 9 (VERDICT r8 #5): PQ compressed index + ADC scoring
    (Jégou et al. 2011)."""

    def test_encode_decode_reconstruction(self, spark, vectors, emb_df):
        """Codes are valid indices; reconstruction error is bounded by the
        per-subspace k-means residual (tiny on the clustered fixture with
        a generous codebook)."""
        cb = S.pq_train(emb_df, m=4, ksub=64)
        assert cb.shape[0] == 4 and cb.shape[2] == DIM // 4
        enc = S.pq_encode(emb_df, cb)
        assert "embedding" not in enc.columns  # vectors leave the index
        rows = sorted(enc.collect(), key=lambda r: r["vec_id"])
        codes = np.asarray([r["pq_code"] for r in rows])
        assert codes.shape == (N, 4)
        assert codes.min() >= 0 and codes.max() < cb.shape[1]
        recon = S.pq_reconstruct_np(codes, cb)
        err = np.linalg.norm(recon - vectors.astype(np.float64), axis=1)
        scale = np.linalg.norm(vectors.astype(np.float64), axis=1).mean()
        assert err.mean() / scale < 0.25

    def test_adc_matches_numpy_reconstruction_cosine(self, spark, vectors, emb_df):
        """The ADC cosine returned by ivf_pq_ann_topk must equal
        cos(query, reconstruction(code)) computed in numpy — the scoring
        math is exact given the codes; only the codes are lossy."""
        cb = S.pq_train(emb_df, m=4, ksub=64)
        cent = S.train_ivf_centroids(emb_df, 12)
        queries = emb_df.where(F.col("vec_id") < 3)
        got = S.ivf_pq_ann_topk(
            emb_df, queries, k=5, n_centroids=12, nprobe=12,
            centroids=cent, codebooks=cb,
        ).collect()
        enc = {
            r["vec_id"]: np.asarray(r["pq_code"])
            for r in S.pq_encode(emb_df, cb).collect()
        }
        Xd = vectors.astype(np.float64)
        for r in got:
            recon = S.pq_reconstruct_np(enc[r["neighbor_id"]][None, :], cb)[0]
            q = Xd[r["query_id"]]
            want = float(
                q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon))
            )
            assert r["cosine"] == pytest.approx(want, abs=1e-12)

    def test_ivf_pq_recall_vs_exact(self, spark, vectors, emb_df):
        """Full-probe IVF-PQ recall@5 vs exact cosine on the clustered
        fixture: quantization alone (nprobe = all cells removes the IVF
        miss term) must keep most true neighbors."""
        k = 5
        queries = emb_df.where(F.col("vec_id") < 10)
        exact = S.brute_force_topk(emb_df, queries, k=k).collect()
        approx = S.ivf_pq_ann_topk(
            emb_df, queries, k=k, n_centroids=12, nprobe=12, m=4, ksub=64
        ).collect()
        truth: dict[int, set] = {}
        for r in exact:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        found: dict[int, set] = {}
        for r in approx:
            found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [len(truth[q] & found.get(q, set())) / k for q in truth]
        assert np.mean(recalls) >= 0.6
        # restricted probing must still work (the production setting)
        approx2 = S.ivf_pq_ann_topk(
            emb_df, queries, k=k, n_centroids=12, nprobe=4, m=4, ksub=64
        ).collect()
        found2: dict[int, set] = {}
        for r in approx2:
            found2.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls2 = [len(truth[q] & found2.get(q, set())) / k for q in truth]
        assert np.mean(recalls2) >= 0.5

    def test_index_bytes_per_vector(self, spark, emb_df, tmp_path):
        """The memory claim, measured: the parquet-persisted PQ index's
        payload is the m sub-indices — orders below the 4*dim float
        vectors at real dim. Asserted on the logical payload (codes are
        m small ints vs dim floats) and observed on disk."""
        import os

        cb = S.pq_train(emb_df, m=4, ksub=64)
        enc = S.pq_encode(emb_df, cb)
        p_idx = str(tmp_path / "pq_index")
        p_raw = str(tmp_path / "raw")
        enc.coalesce(1).write.parquet(p_idx)
        emb_df.coalesce(1).write.parquet(p_raw)

        def pbytes(d):
            return sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )

        idx_bpv = pbytes(p_idx) / N
        raw_bpv = pbytes(p_raw) / N
        # logical payload: m=4 codes vs DIM=16 float32s = 4x even before
        # encoding; parquet overheads dominate at N=120, so assert the
        # directional claim on-disk and the exact one logically
        assert idx_bpv < raw_bpv
        assert 4 * 4 <= DIM * 4  # m ints (<=4B each) vs dim float32
        # codes at ksub=64 need 6 bits/subspace: 3 bytes/vector of true
        # payload; report the measured number for the survey
        print(f"pq index {idx_bpv:.1f} B/vec vs raw {raw_bpv:.1f} B/vec")

    def test_pq_train_validates_dim(self, spark, emb_df):
        with pytest.raises(ValueError, match="divisible"):
            S.pq_train(emb_df, m=5)

    def test_residual_adc_matches_numpy_reconstruction(self, spark, vectors, emb_df):
        """by_residual=True: ADC cosine must equal cos(q, centroid_cell +
        decode(code)) computed in numpy — pins the cross-term table and
        the per-(query, cell) centroid dot."""
        cent = S.train_ivf_centroids(emb_df, 12)
        sm = S.sample_vectors(emb_df, "embedding")
        a = (sm @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]).argmax(1)
        cb = S.pq_train(emb_df, m=4, ksub=64, sample=sm - cent[a])
        queries = emb_df.where(F.col("vec_id") < 3)
        got = S.ivf_pq_ann_topk(
            emb_df, queries, k=5, n_centroids=12, nprobe=12,
            centroids=cent, codebooks=cb, by_residual=True,
        ).collect()
        # reproduce the index driver-side
        Xd = vectors.astype(np.float64)
        centn2 = 0.5 * (cent * cent).sum(1)
        cells = (Xd @ cent.T - centn2[None, :]).argmax(1)
        R = Xd - cent[cells]
        dsub = DIM // 4
        codes = np.stack(
            [
                ((cb[j] * cb[j]).sum(1)[None, :]
                 - 2.0 * (R[:, j*dsub:(j+1)*dsub] @ cb[j].T)).argmin(1)
                for j in range(4)
            ],
            axis=1,
        )
        for r in got:
            nid = r["neighbor_id"]
            recon = cent[cells[nid]] + np.concatenate(
                [cb[j][codes[nid, j]] for j in range(4)]
            )
            q = Xd[r["query_id"]]
            want = float(q @ recon / (np.linalg.norm(q) * np.linalg.norm(recon)))
            assert r["cosine"] == pytest.approx(want, abs=1e-12)

    def test_residual_beats_plain_adc_on_clustered_data(self, spark, vectors, emb_df):
        """On clustered data the residual encoding spends the code budget
        on within-cell structure: plain-ADC (no refine) recall must be at
        least as good as raw-vector PQ at the same (m, ksub), and
        absolutely decent."""
        k = 5
        queries = emb_df.where(F.col("vec_id") < 10)
        exact = S.brute_force_topk(emb_df, queries, k=k).collect()
        truth: dict[int, set] = {}
        for r in exact:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

        def recall(rows):
            found: dict[int, set] = {}
            for r in rows:
                found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return float(
                np.mean([len(truth[q] & found.get(q, set())) / k for q in truth])
            )

        cent = S.train_ivf_centroids(emb_df, 12)
        plain = recall(
            S.ivf_pq_ann_topk(
                emb_df, queries, k=k, n_centroids=12, nprobe=12,
                centroids=cent, m=4, ksub=16,
            ).collect()
        )
        resid = recall(
            S.ivf_pq_ann_topk(
                emb_df, queries, k=k, n_centroids=12, nprobe=12,
                centroids=cent, m=4, ksub=16, by_residual=True,
            ).collect()
        )
        assert resid >= plain
        assert resid >= 0.5

    def test_pq_model_round_trip(self, spark, emb_df, tmp_path):
        """save_pq/load_pq: bit-exact round trip (float64 via JSON repr),
        format tag enforced, encoding with the reloaded model equals the
        original."""
        import json

        cent = S.train_ivf_centroids(emb_df, 12)
        cb = S.pq_train(emb_df, m=4, ksub=32)
        p = str(tmp_path / "pq.json")
        S.save_pq(p, cb, centroids=cent, by_residual=True)
        cb2, cent2, br = S.load_pq(p)
        assert br is True
        assert np.array_equal(cb, cb2) and np.array_equal(cent, cent2)
        a = {r["vec_id"]: list(r["pq_code"]) for r in S.pq_encode(emb_df, cb).collect()}
        b = {r["vec_id"]: list(r["pq_code"]) for r in S.pq_encode(emb_df, cb2).collect()}
        assert a == b
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as fh:
            json.dump({"format": "other"}, fh)
        with pytest.raises(ValueError, match="pq_model"):
            S.load_pq(bad)

    def test_residual_join_matches_topk(self, spark, emb_df):
        cent = S.train_ivf_centroids(emb_df, 12)
        sm = S.sample_vectors(emb_df, "embedding")
        a = (sm @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]).argmax(1)
        cb = S.pq_train(emb_df, m=4, ksub=32, sample=sm - cent[a])
        queries = emb_df.where(F.col("vec_id") < 8)
        x = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in S.ivf_pq_ann_topk(
                emb_df, queries, k=4, n_centroids=12, nprobe=4,
                centroids=cent, codebooks=cb, by_residual=True, refine=16,
            ).collect()
        }
        y = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in S.ivf_pq_ann_join(
                emb_df, queries, k=4, n_centroids=12, nprobe=4,
                centroids=cent, codebooks=cb, by_residual=True, refine=16,
            ).collect()
        }
        assert x == y and len(y) > 0


class TestOPQ:
    """Round 9: OPQ (Ge et al. 2013) — learned rotation before PQ."""

    def _correlated_df(self, spark):
        # data whose variance concentrates in a rotated 2D structure that
        # the CONTIGUOUS subspace split chops badly: plain PQ must pay,
        # the learned rotation must recover it
        rng = np.random.RandomState(3)
        n, dim = 400, 8
        Z = rng.standard_normal((n, dim)) * np.array(
            [8.0, 7.0, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2]
        )
        Qr, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
        X = (Z @ Qr).astype(np.float64)
        df = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )
        return df, X

    def test_opq_reduces_reconstruction_error(self, spark):
        df, X = self._correlated_df(spark)
        sv = S.sample_vectors(df, "embedding")
        cb_plain = S.pq_train(df, m=4, ksub=16, sample=sv)
        codes = []
        dsub = 2
        for j in range(4):
            Xj = sv[:, j * dsub : (j + 1) * dsub]
            d = (cb_plain[j] * cb_plain[j]).sum(1)[None, :] - 2.0 * (Xj @ cb_plain[j].T)
            codes.append(d.argmin(1))
        recon_plain = np.concatenate(
            [cb_plain[j][codes[j]] for j in range(4)], axis=1
        )
        err_plain = float(((sv - recon_plain) ** 2).sum())

        R, cb = S.opq_train(df, m=4, ksub=16, sample=sv)
        assert np.allclose(R @ R.T, np.eye(8), atol=1e-10)  # orthogonal
        Xr = sv @ R
        recon = np.empty_like(Xr)
        for j in range(4):
            Xj = Xr[:, j * dsub : (j + 1) * dsub]
            d = (cb[j] * cb[j]).sum(1)[None, :] - 2.0 * (Xj @ cb[j].T)
            recon[:, j * dsub : (j + 1) * dsub] = cb[j][d.argmin(1)]
        err_opq = float(((Xr - recon) ** 2).sum())
        assert err_opq < 0.7 * err_plain  # material, not marginal

    def test_rotation_composes_with_pq_search(self, spark):
        """End-to-end: rotate both sides, search with the OPQ codebooks
        (refine gives exact cosines — rotation-invariant, so they match
        the unrotated brute force)."""
        df, X = self._correlated_df(spark)
        R, cb = S.opq_train(df, m=4, ksub=16)
        rot = S.rotate_vectors(df, R)
        queries = rot.where(F.col("vec_id") < 5)
        got = S.ivf_pq_ann_topk(
            rot, queries, k=3, n_centroids=8, nprobe=8,
            codebooks=cb, refine=20,
        ).collect()
        exact = S.brute_force_topk(
            df, df.where(F.col("vec_id") < 5), k=3
        ).collect()
        ex = {
            (r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact
        }
        hits = 0
        for r in got:
            key = (r["query_id"], r["neighbor_id"])
            if key in ex:
                hits += 1
                # refine cosines are exact; rotation preserves them
                assert r["cosine"] == pytest.approx(ex[key], abs=1e-9)
        assert hits / len(ex) >= 0.8

    def test_opq_validates_dim(self, spark, emb_df):
        with pytest.raises(ValueError, match="divisible"):
            S.opq_train(emb_df, m=5)


class TestScalarQuantization:
    """Round 9: SQ8 — the codebook-free compressed path."""

    def test_encode_decode_error_bound(self, spark, vectors, emb_df):
        vmin, vmax = S.sq_train(emb_df)
        enc = S.sq_encode(emb_df, vmin, vmax)
        assert "embedding" not in enc.columns
        rows = sorted(enc.collect(), key=lambda r: r["vec_id"])
        codes = [bytes(r["sq_code"]) for r in rows]
        assert all(len(c) == DIM for c in codes)  # exactly dim bytes
        recon = S.sq_reconstruct_np(codes, vmin, vmax)
        # per-dim error <= half a quantization step (+fp slack)
        step = (vmax - vmin) / 255.0
        err = np.abs(recon - vectors.astype(np.float64))
        assert (err <= step / 2 + 1e-12).all()

    def test_topk_recall_near_exact(self, spark, emb_df):
        """8-bit scalar quantization is near-lossless for cosine ranking:
        recall@5 vs exact must be high on the clustered fixture."""
        queries = emb_df.where(F.col("vec_id") < 10)
        exact = S.brute_force_topk(emb_df, queries, k=5).collect()
        truth: dict[int, set] = {}
        for r in exact:
            truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        vmin, vmax = S.sq_train(emb_df)
        idx = S.sq_encode(emb_df, vmin, vmax)
        got = S.sq_brute_force_topk(idx, queries, vmin, vmax, k=5).collect()
        found: dict[int, set] = {}
        for r in got:
            found.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [len(truth[q] & found.get(q, set())) / 5 for q in truth]
        assert np.mean(recalls) >= 0.9

    def test_sq_model_round_trip(self, spark, emb_df, tmp_path):
        import json

        vmin, vmax = S.sq_train(emb_df)
        p = str(tmp_path / "sq.json")
        S.save_sq(p, vmin, vmax)
        v2min, v2max = S.load_sq(p)
        assert np.array_equal(vmin, v2min) and np.array_equal(vmax, v2max)
        bad = str(tmp_path / "bad.json")
        with open(bad, "w") as fh:
            json.dump({"format": "other"}, fh)
        with pytest.raises(ValueError, match="sq_model"):
            S.load_sq(bad)

    def test_constant_dim_and_clip(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 5.0]), (1, [1.0, 7.0])],
            "vec_id long, embedding array<float>",
        )
        vmin, vmax = S.sq_train(df)
        assert vmax[0] > vmin[0]  # constant dim keeps a nonzero span
        # out-of-range value clips instead of wrapping
        wild = spark.createDataFrame(
            [(9, [1.0, 99.0])], "vec_id long, embedding array<float>"
        )
        r = S.sq_encode(wild, vmin, vmax).collect()[0]
        recon = S.sq_reconstruct_np([bytes(r["sq_code"])], vmin, vmax)[0]
        assert recon[1] == pytest.approx(vmax[1])


def test_ivf_assignment_is_narrow_and_broadcast(spark, emb_df):
    """Plan shape: corpus-side cell assignment adds no shuffle; the probe
    join broadcasts the query side."""
    from dask_glm_spark.plans import audit

    queries = emb_df.where(F.col("vec_id") < 3)
    topk = S.ivf_ann_topk(emb_df, queries, k=3, n_centroids=8, nprobe=2)
    assert audit.has_broadcast(topk)
    # shuffles: candidate distinct + top-k window (+ AQE variants), never a
    # corpus-wide repartition for the assignment itself
    assert audit.count_exchanges(topk) <= 3


def test_kmeans_np_converges_on_clusters(vectors):
    cent = S._kmeans_np(vectors.astype(np.float64), 12, iters=10)
    assert cent.shape == (12, DIM)
    # every training point should sit near some centroid
    d = ((vectors[:, None, :] - cent[None, :, :]) ** 2).sum(-1).min(1)
    assert float(np.median(d)) < 0.5 * DIM


def test_lsh_planted_neardup_same_bucket(spark, emb_df):
    """A near-identical vector pair lands in the same LSH bucket and is
    returned by the near-dup operator."""
    pairs = S.embedding_neardup_pairs(emb_df, threshold=0.99, method="lsh").collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)


def test_neardup_exact_blocked(spark, emb_df):
    blocked = emb_df.withColumn("blk", (F.col("vec_id") % 2).cast("int"))
    # 0 and 1 are both even/odd? 0 even, 1 odd -> different blocks; put the
    # planted pair together instead: block by vec_id // 64
    blocked = emb_df.withColumn("blk", (F.col("vec_id") / 64).cast("int"))
    pairs = S.embedding_neardup_pairs(
        blocked, threshold=0.99, block_col="blk", method="exact"
    ).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)


def test_exact_requires_block(emb_df):
    with pytest.raises(ValueError):
        S.embedding_neardup_pairs(emb_df, method="exact")


def test_ivf_duplicate_centroid_tiebreak(spark):
    """Review r5: with duplicate centroids, queries must probe the SAME
    (lowest-index) cell the corpus assigns to — not the empty duplicate."""
    import numpy as np

    from dask_glm_spark.operators.similarity import ivf_ann_topk

    rng = np.random.RandomState(5)
    X = rng.standard_normal((40, 8))
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = np.vstack([X[0], X[0], X[20]])  # centroids 1 and 2 identical
    out = ivf_ann_topk(df, df.limit(5), k=3, centroids=cent, nprobe=1)
    per_query = {}
    for r in out.collect():
        per_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # every query near the duplicated centroid still gets neighbors
    assert len(per_query) == 5
    assert all(len(v) > 0 for v in per_query.values())


def test_infer_dim_clean_errors(spark):
    import pytest as _pytest

    from dask_glm_spark.operators.similarity import lsh_ann_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty input"):
        lsh_ann_topk(empty, empty, k=2)


def test_exact_neardup_string_ids(spark):
    """Review r5: the exact path's schema follows the id column type."""
    import numpy as np

    from dask_glm_spark.operators.similarity import embedding_neardup_pairs

    v = [1.0, 0.0, 0.0]
    rows = [("a", v, 0), ("b", v, 0), ("c", [0.0, 1.0, 0.0], 0)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>, blk int")
    out = embedding_neardup_pairs(
        df, threshold=0.99, block_col="blk", method="exact"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [("a", "b")]


def test_sample_vectors_layout_independent(spark, vectors, emb_df):
    """VERDICT r5: the IVF/k-means driver sample must not depend on file
    layout / row order / partitioning (the old `.limit(n)` pushed into the
    first splits — one stratum on a date-ordered corpus). The hash-top-n
    sample returns the SAME vector set under a sorted layout, a reversed
    sort, and any repartitioning."""
    n = 40
    base = S.sample_vectors(emb_df, "embedding", n)
    shuffled = emb_df.orderBy(F.desc("vec_id")).repartition(7)
    sorted_layout = emb_df.orderBy("vec_id").coalesce(1)
    for variant in (shuffled, sorted_layout):
        got = S.sample_vectors(variant, "embedding", n)
        assert {tuple(v) for v in got} == {tuple(v) for v in base}
    # and it is a real cross-section, not a prefix: with N=120 rows the
    # 40 sampled ids should not be the first 40 of the sorted layout
    first40 = {
        tuple(float(x) for x in vectors[i].astype("float64")) for i in range(n)
    }
    assert {tuple(v) for v in base} != first40


def test_lsh_ann_join_matches_topk(spark):
    """The large-both-sides ANN join (shuffle equi-join + two-level
    per-query top-k) returns the SAME (query, neighbor, rank) set as the
    broadcast+Window lsh_ann_topk on identical inputs."""
    from dask_glm_spark.operators.similarity import lsh_ann_join, lsh_ann_topk
    from dask_glm_spark.sources.glm_source import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.orderBy("vec_id").limit(12)
    a = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in lsh_ann_topk(emb, queries, k=4).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in lsh_ann_join(emb, queries, k=4).collect()
    }
    assert a == b and len(b) > 0


def test_lsh_ann_join_plan_no_window(spark):
    from dask_glm_spark.operators.similarity import lsh_ann_join
    from dask_glm_spark.plans import audit
    from dask_glm_spark.sources.glm_source import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = audit.explain_str(lsh_ann_join(emb, emb, k=3), "simple")
    assert "Window" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_ivf_pq_ann_join_plan_no_window(spark):
    """The PQ join path must keep the lsh/ivf join contracts: Window-free
    top-k and no cartesian/nested-loop anywhere (including the refine
    join-back)."""
    from dask_glm_spark.operators.similarity import ivf_pq_ann_join
    from dask_glm_spark.plans import audit
    from dask_glm_spark.sources.glm_source import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = audit.explain_str(
        ivf_pq_ann_join(emb, emb, k=3, n_centroids=8, refine=10), "simple"
    )
    assert "Window" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_grouped_topk_rank_and_bounds(spark):
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.topk import grouped_topk

    df = spark.createDataFrame(
        [(g, i, float((i * 7) % 13)) for g in ("a", "b") for i in range(40)],
        "g string, i long, v double",
    ).repartition(7)
    got = grouped_topk(df, "g", ["v", "i"], 5, rank_col="rank").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["g"], []).append((r["rank"], r["v"], r["i"]))
    for g, rows in by_g.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
        want = sorted(
            ((i * 7) % 13, i) for i in range(40)
        )[:5]
        assert [(v, i) for _, v, i in rows] == [(float(v), i) for v, i in want]


def test_lsh_ann_join_bucket_cap(spark):
    """A degenerate all-identical corpus lands in ONE bucket; the cap
    bounds the corpus side per bucket (candidates per query <= cap) while
    the uncapped join scores every corpus row."""
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.similarity import lsh_ann_join

    base = [1.0, 0.0, 0.5, 0.25]
    corpus = spark.createDataFrame(
        [(i, base) for i in range(300)], "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(1000, base)], "vec_id long, embedding array<double>"
    )
    full = lsh_ann_join(corpus, queries, k=500, multiprobe=False)
    assert full.count() == 300
    capped = lsh_ann_join(
        corpus, queries, k=500, multiprobe=False, max_per_bucket=20
    )
    assert capped.count() == 20
    # capped output is a subset of the uncapped candidates, rank-contiguous
    ranks = sorted(r["rank"] for r in capped.collect())
    assert ranks == list(range(1, 21))


def test_ivf_ann_join_matches_topk(spark):
    from dask_glm_spark.operators.similarity import ivf_ann_join, ivf_ann_topk
    from dask_glm_spark.sources.glm_source import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.orderBy("vec_id").limit(12)
    a = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_ann_topk(emb, queries, k=4, n_centroids=8).collect()
    }
    b = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_ann_join(emb, queries, k=4, n_centroids=8).collect()
    }
    assert a == b and len(b) > 0


def test_ivf_pq_ann_join_matches_topk(spark):
    """Round 9: the no-broadcast two-corpus PQ join must produce the
    identical result set as the broadcast topk variant (shared
    quantizer + codebooks pin the candidate generation and scoring),
    with and without the exact refine stage."""
    from dask_glm_spark.operators.similarity import (
        ivf_pq_ann_join,
        ivf_pq_ann_topk,
        pq_train,
        train_ivf_centroids,
    )
    from dask_glm_spark.sources.glm_source import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.orderBy("vec_id").limit(12)
    cent = train_ivf_centroids(emb, 8)
    cb = pq_train(emb, m=8, ksub=32)
    for refine in (None, 16):
        a = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ivf_pq_ann_topk(
                emb, queries, k=4, n_centroids=8,
                centroids=cent, codebooks=cb, refine=refine,
            ).collect()
        }
        b = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ivf_pq_ann_join(
                emb, queries, k=4, n_centroids=8,
                centroids=cent, codebooks=cb, refine=refine,
            ).collect()
        }
        assert a == b and len(b) > 0
    # hot-cell cap: output is a subset of the uncapped candidate ids
    capped = ivf_pq_ann_join(
        emb, queries, k=4, n_centroids=8,
        centroids=cent, codebooks=cb, max_per_cell=50,
    ).collect()
    assert len(capped) > 0
    assert all(1 <= r["rank"] <= 4 for r in capped)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=0, max_value=10_000),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],  # unique id tiebreaker
    ),
    k=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=5, deadline=None)
def test_grouped_topk_property(spark, rows, k):
    """grouped_topk == sorted-oracle top-k per group for arbitrary data
    (unique ids as the tiebreaker, any grouping, any k)."""
    from dask_glm_spark.operators.topk import grouped_topk

    df = spark.createDataFrame(rows, "g string, i long, v double").repartition(5)
    got = {}
    for r in grouped_topk(df, "g", ["v", "i"], k, rank_col="rank").collect():
        got.setdefault(r["g"], []).append((r["rank"], r["v"], r["i"]))
    want = {}
    for g, i, v in rows:
        want.setdefault(g, []).append((v, i))
    for g in want:
        top = sorted(want[g])[:k]
        ours = sorted(got.get(g, []))
        assert [(v, i) for _, v, i in ours] == top
        assert [r for r, _, _ in ours] == list(range(1, len(top) + 1))


def test_embedding_dedup_incremental_across_batches(spark):
    from dask_glm_spark.operators.similarity import embedding_dedup_incremental

    v = [1.0, 0.2, -0.5, 0.8]
    near = [x * 1.001 + (0.0005 if i == 1 else 0.0) for i, x in enumerate(v)]
    other = [-0.9, 0.4, 0.7, -0.1]
    b1 = spark.createDataFrame(
        [(1, v), (2, other)], "vec_id long, embedding array<double>"
    )
    s1, idx1 = embedding_dedup_incremental(b1, None, threshold=0.99)
    assert sorted(r["vec_id"] for r in s1.collect()) == [1, 2]
    assert idx1.count() == 2

    fresh = [0.1, -0.8, 0.3, 0.5]
    b2 = spark.createDataFrame(
        [(10, near), (11, fresh)], "vec_id long, embedding array<double>"
    )
    s2, idx2 = embedding_dedup_incremental(b2, idx1, threshold=0.99)
    assert sorted(r["vec_id"] for r in s2.collect()) == [11]
    assert idx2.count() == 3
    s3, idx3 = embedding_dedup_incremental(b1, idx2, threshold=0.99)
    assert s3.count() == 0 and idx3.count() == 3


class TestHardNegatives:
    def _labeled(self, spark, vectors):
        # label = cluster index (12 clusters x 10 vectors)
        rows = [
            (i, i // 10, [float(x) for x in vectors[i]]) for i in range(N)
        ]
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def test_negatives_are_other_label_and_recall(self, spark, vectors):
        from dask_glm_spark.operators.similarity import hard_negative_ids

        df = self._labeled(spark, vectors)
        k = 5
        got = hard_negative_ids(df, k=k, n_planes=3).collect()
        labels = {i: i // 10 for i in range(N)}
        by_anchor: dict = {}
        for r in got:
            assert labels[r["neg_id"]] != labels[r["anchor_id"]]
            assert r["neg_id"] != r["anchor_id"]
            by_anchor.setdefault(r["anchor_id"], []).append(
                (r["rank"], r["neg_id"], r["cosine"])
            )
        # ranks are 1..m contiguous, cosine non-increasing
        for a, lst in by_anchor.items():
            lst.sort()
            assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
            cs = [c for _, _, c in lst]
            assert all(cs[i] >= cs[i + 1] - 1e-12 for i in range(len(cs) - 1))
        # recall vs brute-force other-label top-k
        Xn = vectors.astype(np.float64)
        Xn = Xn / np.linalg.norm(Xn, axis=1, keepdims=True)
        sims = Xn @ Xn.T
        recalls = []
        for a in range(0, N, 7):
            mask = np.array([labels[j] != labels[a] for j in range(N)])
            order = np.argsort(-sims[a])
            truth = [j for j in order if mask[j]][:k]
            found = {nid for _, nid, _ in by_anchor.get(a, [])}
            recalls.append(len(set(truth) & found) / k)
        assert np.mean(recalls) >= 0.5

    def test_layout_independent_and_no_window(self, spark, vectors):
        from dask_glm_spark.operators.similarity import hard_negative_ids
        from dask_glm_spark.plans import audit

        df = self._labeled(spark, vectors)
        a = sorted(
            (r["anchor_id"], r["neg_id"], r["rank"])
            for r in hard_negative_ids(df, k=3).collect()
        )
        b = sorted(
            (r["anchor_id"], r["neg_id"], r["rank"])
            for r in hard_negative_ids(df.repartition(9), k=3).collect()
        )
        assert a == b and len(a) > 0
        plan = audit.explain_str(hard_negative_ids(df, k=3), "simple")
        assert "Window" not in plan
        assert "Cartesian" not in plan and "NestedLoop" not in plan

    def test_anchor_batch_equals_full_slice(self, spark, vectors):
        """anchors= restricts the mining to a query batch; results equal
        the full-corpus run sliced to those anchors."""
        from pyspark.sql import functions as F

        from dask_glm_spark.operators.similarity import hard_negative_ids

        df = self._labeled(spark, vectors)
        batch = df.where(F.col("vec_id") < 15)
        a = sorted(
            (r["anchor_id"], r["neg_id"], r["rank"])
            for r in hard_negative_ids(df, k=3, anchors=batch).collect()
        )
        b = sorted(
            (r["anchor_id"], r["neg_id"], r["rank"])
            for r in hard_negative_ids(df, k=3).collect()
            if r["anchor_id"] < 15
        )
        assert a == b and len(a) > 0

    def test_null_labels_excluded_both_ways(self, spark, vectors):
        from dask_glm_spark.operators.similarity import hard_negative_ids

        rows = [
            (i, None if i < 5 else i // 10, [float(x) for x in vectors[i]])
            for i in range(30)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )
        got = hard_negative_ids(df, k=4, n_planes=3).collect()
        ids_null = set(range(5))
        for r in got:
            assert r["anchor_id"] not in ids_null
            assert r["neg_id"] not in ids_null


class TestIndexPersistence:
    def test_ivf_pq_index_round_trip_identical_topk(self, spark, emb_df, tmp_path):
        """Round 10 (VERDICT r9 #8): the index-LEVEL round trip — build
        the ivf_pq_index frame once, save it + its quantizers as one
        artifact, reload, probe, and get IDENTICAL top-k rows to the
        in-session ivf_pq_ann_topk path (ADC-only and refine, both)."""
        cent = S.train_ivf_centroids(emb_df, 12)
        cb = S.pq_train(emb_df, m=4, ksub=32)
        idx = S.ivf_pq_index(emb_df, cent, cb)
        root = str(tmp_path / "ivfpq")
        S.save_ivf_pq_index(root, idx, cent, cb)

        idx2, cent2, cb2, br = S.load_ivf_pq_index(spark, root)
        assert br is False
        assert np.array_equal(cent, cent2) and np.array_equal(cb, cb2)

        queries = emb_df.where(F.col("vec_id") < 8)

        def rows(df):
            return {
                (r["query_id"], r["neighbor_id"], r["rank"],
                 round(r["cosine"], 12))
                for r in df.collect()
            }

        # ADC-only: probe over the reloaded artifact == in-session build
        want = rows(S.ivf_pq_ann_topk(
            emb_df, queries, k=5, n_centroids=12, nprobe=6,
            centroids=cent, codebooks=cb,
        ))
        got = rows(S.ivf_pq_probe(idx2, queries, cent2, cb2, k=5, nprobe=6))
        assert got == want

        # exact refine: needs the raw corpus alongside the index
        want_r = rows(S.ivf_pq_ann_topk(
            emb_df, queries, k=5, n_centroids=12, nprobe=6,
            centroids=cent, codebooks=cb, refine=20,
        ))
        got_r = rows(S.ivf_pq_probe(
            idx2, queries, cent2, cb2, k=5, nprobe=6, refine=20,
            corpus=emb_df,
        ))
        assert got_r == want_r

    def test_ivf_pq_probe_guards(self, spark, emb_df, tmp_path):
        """refine without corpus and probe without quantizers both fail
        loudly; a centroid-less model is rejected at load."""
        cent = S.train_ivf_centroids(emb_df, 12)
        cb = S.pq_train(emb_df, m=4, ksub=32)
        idx = S.ivf_pq_index(emb_df, cent, cb)
        queries = emb_df.where(F.col("vec_id") < 4)
        with pytest.raises(ValueError, match="refine needs the raw"):
            S.ivf_pq_probe(idx, queries, cent, cb, refine=10).collect()
        with pytest.raises(ValueError, match="centroids"):
            S._ivf_pq_ann(
                None, queries, 5, "vec_id", "embedding", 12, 2,
                None, cb, None, None, None, True, None, index=idx,
            )
        root = str(tmp_path / "nocent")
        import os
        os.makedirs(root, exist_ok=True)
        S.save_pq(os.path.join(root, "model.json"), cb)  # no centroids
        with pytest.raises(ValueError, match="no centroids"):
            S.load_ivf_pq_index(spark, root)

    def test_residual_index_round_trip(self, spark, emb_df, tmp_path):
        """by_residual survives the artifact: reloaded flag drives the
        residual ADC tables and the probe matches in-session."""
        cent = S.train_ivf_centroids(emb_df, 12)
        sm = S.sample_vectors(emb_df, "embedding")
        a = (sm @ cent.T - 0.5 * (cent * cent).sum(1)[None, :]).argmax(1)
        cb = S.pq_train(emb_df, m=4, ksub=32, sample=sm - cent[a])
        idx = S.ivf_pq_index(emb_df, cent, cb, by_residual=True)
        root = str(tmp_path / "resid")
        S.save_ivf_pq_index(root, idx, cent, cb, by_residual=True)
        idx2, cent2, cb2, br = S.load_ivf_pq_index(spark, root)
        assert br is True
        queries = emb_df.where(F.col("vec_id") < 8)
        want = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in S.ivf_pq_ann_topk(
                emb_df, queries, k=5, n_centroids=12, nprobe=6,
                centroids=cent, codebooks=cb, by_residual=True,
            ).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in S.ivf_pq_probe(
                idx2, queries, cent2, cb2, k=5, nprobe=6, by_residual=br,
            ).collect()
        }
        assert got == want

    def test_partitioned_index_prunes_cells(self, spark, emb_df, tmp_path):
        """Round 10: cell-partitioned artifact + prune_cells probing —
        identical top-k to the unpartitioned/unpruned path, and the
        index scan's plan carries a cell partition filter so a probe
        reads nprobe/C of the index bytes at scale."""
        from dask_glm_spark.plans import audit

        cent = S.train_ivf_centroids(emb_df, 12)
        cb = S.pq_train(emb_df, m=4, ksub=32)
        idx = S.ivf_pq_index(emb_df, cent, cb)
        root = str(tmp_path / "ivfpq_part")
        S.save_ivf_pq_index(root, idx, cent, cb, partition_by_cell=True)
        idx2, cent2, cb2, br = S.load_ivf_pq_index(spark, root)
        assert dict(idx2.dtypes)["cell"] == "bigint"  # pinned after hive inference

        queries = emb_df.where(F.col("vec_id") < 8)
        want = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in S.ivf_pq_ann_topk(
                emb_df, queries, k=5, n_centroids=12, nprobe=3,
                centroids=cent, codebooks=cb,
            ).collect()
        }
        pruned = S.ivf_pq_probe(
            idx2, queries, cent2, cb2, k=5, nprobe=3, prune_cells=True
        )
        got = {
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in pruned.collect()
        }
        assert got == want
        # the scan must carry the cell filter down to the partitioned
        # source (PartitionFilters on the parquet relation)
        plan = audit.explain_str(pruned)
        assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]

    def test_append_to_index(self, spark, emb_df, tmp_path):
        """Round 10: FAISS add() analogue — new vectors encoded with the
        SAVED quantizers land in the artifact via mode(append); a probe
        over the reloaded index finds a planted near-copy among the
        appended rows, in both flat and cell-partitioned layouts."""
        base = emb_df.where(F.col("vec_id") < 100)
        extra = emb_df.where(F.col("vec_id") >= 100)
        cent = S.train_ivf_centroids(emb_df, 12)
        cb = S.pq_train(emb_df, m=4, ksub=32)
        for part in (False, True):
            root = str(tmp_path / f"app_{part}")
            S.save_ivf_pq_index(
                root, S.ivf_pq_index(base, cent, cb), cent, cb,
                partition_by_cell=part,
            )
            S.append_to_ivf_pq_index(root, extra)
            idx2, cent2, cb2, br = S.load_ivf_pq_index(spark, root)
            assert idx2.count() == emb_df.count()
            # full-index probe == in-session index over the full corpus
            queries = emb_df.where(F.col("vec_id") < 4)
            want = {
                (r["query_id"], r["neighbor_id"], r["rank"])
                for r in S.ivf_pq_ann_topk(
                    emb_df, queries, k=5, n_centroids=12, nprobe=4,
                    centroids=cent, codebooks=cb,
                ).collect()
            }
            got = {
                (r["query_id"], r["neighbor_id"], r["rank"])
                for r in S.ivf_pq_probe(
                    idx2, queries, cent2, cb2, k=5, nprobe=4,
                    prune_cells=part,
                ).collect()
            }
            assert got == want


class TestAdviceR9Regressions:
    def test_encode_with_only_vec_column(self, spark, emb_df):
        """ADVICE r9: a codes-only projection (input holds just the
        vector column, keep_vec=False) must yield a valid single-field
        schema, not a leading-comma parse error."""
        cb = S.pq_train(emb_df, m=4, ksub=16)
        vec_only = emb_df.select("embedding")
        codes = S.pq_encode(vec_only, cb).collect()
        assert len(codes) == N and len(codes[0]["pq_code"]) == 4
        lo, hi = S.sq_train(emb_df)
        sq = S.sq_encode(vec_only, lo, hi).collect()
        assert len(sq) == N and len(sq[0]["sq_code"]) == DIM

    def test_sq_encode_guards_constant_dimension_range(self, spark, emb_df):
        """ADVICE r9: caller-supplied ranges with a constant dimension
        (hi == lo) must not produce inf/NaN scales silently cast to
        garbage uint8 — the sq_train span guard now applies at encode
        too (code 0, exact reconstruction at vmin)."""
        rng = np.random.RandomState(11)
        X = rng.standard_normal((6, 4))
        X[:, 2] = 0.7  # constant dimension in the DATA
        df = spark.createDataFrame(
            [(i, [float(v) for v in X[i]]) for i in range(6)],
            "vec_id long, embedding array<double>",
        )
        lo, hi = X.min(0), X.max(0)  # caller range: hi==lo on dim 2
        rows = S.sq_encode(df.select("vec_id", "embedding"), lo, hi).collect()
        codes = np.stack(
            [np.frombuffer(r["sq_code"], dtype=np.uint8) for r in rows]
        )
        # guarded: no garbage from an inf/NaN scale — the constant dim
        # encodes as code 0 (exact reconstruction at vmin)
        assert (codes[:, 2] == 0).all()
        # decoders carry the SAME guard internally (review r10): raw
        # degenerate ranges round-trip without caller-side patching
        dec = S.sq_reconstruct_np([r["sq_code"] for r in rows], lo, hi)
        assert np.allclose(dec[:, 2], 0.7)

    def test_rotate_vectors_in_place_and_new_column(self, spark, emb_df):
        """rotate_vectors: in-place overwrite keeps schema; out_col
        appends array<double>; norms are rotation-invariant."""
        rng = np.random.RandomState(3)
        Q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
        inplace = S.rotate_vectors(emb_df, Q)
        assert inplace.columns == emb_df.columns
        appended = S.rotate_vectors(emb_df, Q, out_col="rot")
        assert appended.columns == emb_df.columns + ["rot"]
        r = appended.where(F.col("vec_id") == 0).collect()[0]
        a = np.asarray(r["embedding"], dtype=np.float64)
        b = np.asarray(r["rot"])
        assert np.isclose(np.linalg.norm(a), np.linalg.norm(b))
        assert np.allclose(a @ Q, b)

    def test_ivf_drops_null_and_ragged_vectors(self, spark, emb_df):
        """Review r10: the Arrow IVF paths keep the former literal-path
        semantics — a null or wrong-length vector falls out of the
        candidate join instead of failing the job."""
        bad = spark.createDataFrame(
            [(900, None), (901, [1.0, 2.0])],
            "vec_id long, embedding array<float>",
        )
        corpus = emb_df.unionByName(bad)
        queries = emb_df.where(F.col("vec_id") < 3)
        # quantizer trained on the clean fixture (training-time sampling
        # fails loudly on ragged data by design); the serving-path joins
        # must skip the stragglers
        cent = S.train_ivf_centroids(emb_df, 8)
        out = S.ivf_ann_topk(
            corpus, queries, k=3, n_centroids=8, nprobe=8, centroids=cent
        ).collect()
        ids = {r["neighbor_id"] for r in out}
        assert out and 900 not in ids and 901 not in ids
        # a null/ragged QUERY row drops silently too
        out2 = S.ivf_ann_topk(
            emb_df, queries.unionByName(bad), k=3, n_centroids=8,
            nprobe=8, centroids=cent,
        ).collect()
        assert {r["query_id"] for r in out2} == {0, 1, 2}

    def test_append_rejects_epoch_layout(self, spark, emb_df, tmp_path):
        """Review r10: a flat append into a stream-built epoch tree would
        mix partition depths and corrupt discovery — reject loudly."""
        import os

        cent = S.train_ivf_centroids(emb_df, 8)
        cb = S.pq_train(emb_df, m=4, ksub=16)
        art = str(tmp_path / "epoch_art")
        os.makedirs(os.path.join(art, "index", "epoch=0"), exist_ok=True)
        S.save_pq(os.path.join(art, "model.json"), cb, centroids=cent)
        with pytest.raises(ValueError, match="stream-built"):
            S.append_to_ivf_pq_index(art, emb_df)
