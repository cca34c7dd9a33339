"""Pallas fused top-k (interpreter mode) + IVF recall harness.

BASELINE's contract is measured recall: IVF recall@10 vs the exact oracle
at given nprobe on clustered data (the realistic embedding regime).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lattice_tpu.ops import topk as topk_ops
from lattice_tpu.ops.ivf import IVFIndex, kmeans_fit
from lattice_tpu.ops.pallas_topk import (BINS, binned_topk,
                                         binned_topk_int4,
                                         binned_topk_int8, fused_topk,
                                         pad_for_tile, refined_topk)


def clustered_data(n, d, n_clusters, seed=0, spread=0.25):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    data = centers[assign] + spread * rng.normal(size=(n, d))
    return topk_ops.l2_normalize(data), assign


class TestFusedTopK:
    @pytest.mark.parametrize("n,tile,k", [(1024, 256, 10), (640, 128, 5)])
    def test_matches_oracle(self, n, tile, k):
        rng = np.random.default_rng(1)
        emb = topk_ops.l2_normalize(rng.normal(size=(n, 64)))
        valid = np.ones(n, dtype=bool)
        valid[n // 3] = False
        q = topk_ops.l2_normalize(rng.normal(size=(3, 64)))
        pemb, pval = pad_for_tile(emb, valid, tile=tile)
        s, i = fused_topk(jnp.asarray(q), jnp.asarray(pemb),
                          jnp.asarray(pval), k, tile=tile, interpret=True)
        o_s, o_i = topk_ops.topk_oracle(q, emb, valid, k)
        # packed-key selection quantizes scores to ~1e-3 (comparable to
        # bf16 storage rounding); indices stay exact
        np.testing.assert_allclose(np.asarray(s), o_s, atol=2e-3)
        for row_got, row_want in zip(np.asarray(i), o_i):
            assert set(row_got.tolist()) == set(row_want.tolist())

    def test_all_invalid_rows(self):
        rng = np.random.default_rng(2)
        emb = topk_ops.l2_normalize(rng.normal(size=(256, 32)))
        valid = np.zeros(256, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        s, _ = fused_topk(jnp.asarray(q), jnp.asarray(emb),
                          jnp.asarray(valid), 5, tile=128, interpret=True)
        assert np.all(np.asarray(s) <= -1e29)

    def test_bf16_storage(self):
        rng = np.random.default_rng(3)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 64)))
        valid = np.ones(512, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(2, 64)))
        s, i = fused_topk(jnp.asarray(q), jnp.asarray(emb, dtype=jnp.bfloat16),
                          jnp.asarray(valid), 10, tile=128, interpret=True)
        o_s, _ = topk_ops.topk_oracle(q, emb, valid, 10)
        np.testing.assert_allclose(np.asarray(s), o_s, atol=2e-2)


class TestRefinedTopK:
    def test_exact_scores_and_order(self):
        # widen + f32 rescore must return oracle scores exactly (not just
        # within the packed-key quantum) and oracle order
        rng = np.random.default_rng(4)
        emb = topk_ops.l2_normalize(rng.normal(size=(1024, 64)))
        valid = np.ones(1024, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(4, 64)))
        s, i = refined_topk(jnp.asarray(q), jnp.asarray(emb),
                            jnp.asarray(valid), 10, widen=16, tile=256,
                            interpret=True)
        o_s, o_i = topk_ops.topk_oracle(q, emb, valid, 10)
        np.testing.assert_allclose(np.asarray(s), o_s, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), o_i)

    def test_fewer_valid_than_widen(self):
        # with only 6 valid rows, the widened stage pads slots with -inf
        # and garbage ids; the rescore must never promote them
        rng = np.random.default_rng(5)
        emb = topk_ops.l2_normalize(rng.normal(size=(256, 32)))
        valid = np.zeros(256, dtype=bool)
        valid[[3, 40, 77, 120, 200, 255]] = True
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        s, i = refined_topk(jnp.asarray(q), jnp.asarray(emb),
                            jnp.asarray(valid), 10, widen=16, tile=128,
                            interpret=True)
        s, i = np.asarray(s), np.asarray(i)
        real = s > -1e29
        assert real.sum(axis=1).tolist() == [6, 6]
        assert set(i[0][real[0]]) <= {3, 40, 77, 120, 200, 255}
        assert set(i[1][real[1]]) <= {3, 40, 77, 120, 200, 255}

    def test_widen_le_k_passthrough(self):
        rng = np.random.default_rng(6)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 32)))
        valid = np.ones(512, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        s_a, i_a = refined_topk(jnp.asarray(q), jnp.asarray(emb),
                                jnp.asarray(valid), 20, widen=16, tile=128,
                                interpret=True)
        s_b, i_b = fused_topk(jnp.asarray(q), jnp.asarray(emb),
                              jnp.asarray(valid), 20, tile=128,
                              interpret=True)
        np.testing.assert_array_equal(np.asarray(i_a), np.asarray(i_b))


class TestBinnedTopK:
    """Binned-max selection: per-(tile, bin-of-strided-columns) maxima +
    XLA top_k + exact rescore. Approximate by design — a true top-k row
    is lost only when a better row shares its (tile, col % BINS) window —
    so tests use collision-free constructions for exactness and a
    statistical bound for the random case."""

    def _planted(self, n, d, rows, seed=0):
        """Corpus where `rows` are near-duplicates of the query (the
        same-file-chunks regime: the expected top-k is an ADJACENT run)."""
        rng = np.random.default_rng(seed)
        emb = topk_ops.l2_normalize(rng.normal(size=(n, d)))
        q = topk_ops.l2_normalize(rng.normal(size=(1, d)))
        for j, r in enumerate(rows):
            emb[r] = topk_ops.l2_normalize(
                q[0] + 0.01 * (j + 1) * rng.normal(size=d))
        return emb, q

    def test_adjacent_run_survives(self):
        # 10 adjacent near-duplicate rows: strided binning must keep all
        # (contiguous binning would keep ~1 — the failure mode the
        # stride exists to prevent)
        rows = list(range(300, 310))
        emb, q = self._planted(1024, 64, rows)
        valid = np.ones(1024, dtype=bool)
        s, i = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                           jnp.asarray(valid), 10, tile=256, interpret=True)
        assert set(np.asarray(i)[0].tolist()) == set(rows)
        o_s, _ = topk_ops.topk_oracle(q, emb, valid, 10)
        np.testing.assert_allclose(np.asarray(s)[0], o_s[0], atol=1e-5)

    def test_matches_oracle_when_collision_free(self):
        # top-k planted in distinct windows -> result must be EXACT
        rows = [0, 17, 34, 51, 300, 317, 600, 900]  # distinct (tile, col%16)
        emb, q = self._planted(1024, 64, rows, seed=1)
        valid = np.ones(1024, dtype=bool)
        valid[17] = False                       # masked row never returned
        s, i = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                           jnp.asarray(valid), 7, tile=256, interpret=True)
        got = set(np.asarray(i)[0].tolist())
        assert got == set(rows) - {17}
        assert 17 not in got

    def test_statistical_recall_random(self):
        rng = np.random.default_rng(7)
        emb = topk_ops.l2_normalize(rng.normal(size=(8192, 32)))
        valid = np.ones(8192, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(8, 32)))
        s, i = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                           jnp.asarray(valid), 10, tile=512, interpret=True)
        _, o_i = topk_ops.topk_oracle(q, emb, valid, 10)
        recall = np.mean([
            len(set(np.asarray(i)[r].tolist()) & set(o_i[r].tolist())) / 10
            for r in range(8)])
        assert recall >= 0.95, recall   # 256 windows; E[loss] ~ 45/256

    def test_all_invalid(self):
        rng = np.random.default_rng(8)
        emb = topk_ops.l2_normalize(rng.normal(size=(256, 32)))
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        s, i = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                           jnp.asarray(np.zeros(256, bool)), 5,
                           tile=128, interpret=True)
        assert np.all(np.asarray(s) <= -1e29)

    def test_k_wider_than_live_rows(self):
        rng = np.random.default_rng(9)
        emb = topk_ops.l2_normalize(rng.normal(size=(128, 32)))
        q = topk_ops.l2_normalize(rng.normal(size=(1, 32)))
        valid = np.zeros(128, bool)
        valid[:20] = True
        s, i = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                           jnp.asarray(valid), 40, tile=128, interpret=True)
        s, i = np.asarray(s), np.asarray(i)
        assert s.shape == (1, 40)
        real = s[0] > -1e29
        assert real.sum() == 20               # every live row surfaced
        assert set(i[0][real]) == set(range(20))

    def test_int8_binned_candidates(self):
        from lattice_tpu.ops.quant import quantize_rows
        rows = list(range(100, 110))
        emb, q = self._planted(1024, 64, rows, seed=2)
        ev, es = quantize_rows(emb)
        qv, qs = quantize_rows(q)
        s1, c1 = binned_topk_int8(
            jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ev),
            jnp.asarray(es), jnp.asarray(np.ones(1024, bool)), 10,
            tile=256, interpret=True)
        assert set(rows) <= set(np.asarray(c1)[0].tolist())

    def test_int8_hoistq_selection_matches_mul(self):
        """The int8 hoistq chain (opt-in): winner sets and restored
        stage scores agree with the mul chain within the packed
        truncation; invalid rows never surface; all-negative scores
        keep exact ordering through the (true+2)/qs packing."""
        from lattice_tpu.ops.quant import quantize_rows
        rng = np.random.default_rng(41)
        rows = list(range(100, 110))
        emb, q = self._planted(1024, 64, rows, seed=2)
        ev, es = quantize_rows(emb)
        qv, qs = quantize_rows(q)
        valid = np.ones(1024, bool)
        valid[rng.integers(0, 1024, 80)] = False
        for r in rows:
            valid[r] = True
        args = (jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ev),
                jnp.asarray(es), jnp.asarray(valid))
        s_h, i_h = binned_topk_int8(*args, 10, tile=256, interpret=True,
                                    selection="hoistq")
        s_m, i_m = binned_topk_int8(*args, 10, tile=256, interpret=True,
                                    selection="mul")
        i_h, i_m = np.asarray(i_h), np.asarray(i_m)
        s_h, s_m = np.asarray(s_h), np.asarray(s_m)
        assert set(rows) <= set(i_h[0].tolist())
        assert not (set(i_h[0].tolist()) & set(np.flatnonzero(~valid)))
        ref = {int(c): float(s) for c, s in zip(i_m[0], s_m[0])}
        for c, s in zip(i_h[0], s_h[0]):
            if int(c) in ref:
                assert abs(ref[int(c)] - float(s)) < 2e-3
        # anti-correlated corpus: every true score negative
        base = topk_ops.l2_normalize(rng.normal(size=(1, 64)))
        anti = topk_ops.l2_normalize(
            -np.abs(rng.normal(size=(256, 1))) * base
            + 0.05 * rng.normal(size=(256, 64)))
        anti = topk_ops.l2_normalize(
            np.where(anti @ base.T > 0, -anti, anti))
        ev2, es2 = quantize_rows(anti)
        qv2, qs2 = quantize_rows(base)
        s_n, i_n = binned_topk_int8(
            jnp.asarray(qv2), jnp.asarray(qs2), jnp.asarray(ev2),
            jnp.asarray(es2), jnp.asarray(np.ones(256, bool)), 8,
            tile=128, interpret=True, selection="hoistq")
        assert (np.asarray(s_n)[0] < 0).all()

    def test_inner_subtiling_matches_full_width(self):
        # sub-tiled compute slabs (inner < tile) must be bit-identical to
        # the full-width kernel: same scores, same ids
        rng = np.random.default_rng(12)
        emb = topk_ops.l2_normalize(rng.normal(size=(1024, 64)))
        q = topk_ops.l2_normalize(rng.normal(size=(4, 64)))
        valid = np.ones(1024, dtype=bool)
        valid[500] = False
        full = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                           jnp.asarray(valid), 10, tile=512, interpret=True)
        sub = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                          jnp.asarray(valid), 10, tile=512, inner=128,
                          interpret=True)
        np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(sub[1]))
        np.testing.assert_allclose(np.asarray(full[0]), np.asarray(sub[0]))

    def test_inner_subtiling_int8_matches(self):
        from lattice_tpu.ops.quant import quantize_rows
        rng = np.random.default_rng(13)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 64)))
        q = topk_ops.l2_normalize(rng.normal(size=(2, 64)))
        ev, es = quantize_rows(emb)
        qv, qs = quantize_rows(q)
        valid = jnp.asarray(np.ones(512, bool))
        full = binned_topk_int8(jnp.asarray(qv), jnp.asarray(qs),
                                jnp.asarray(ev), jnp.asarray(es), valid, 8,
                                tile=512, interpret=True)
        sub = binned_topk_int8(jnp.asarray(qv), jnp.asarray(qs),
                               jnp.asarray(ev), jnp.asarray(es), valid, 8,
                               tile=512, inner=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(sub[1]))

    def test_inner_subtiling_int4_matches(self):
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        rng = np.random.default_rng(14)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 64)))
        q = topk_ops.l2_normalize(rng.normal(size=(2, 64)))
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = jnp.asarray(np.ones(512, bool))
        full = binned_topk_int4(jnp.asarray(qv), jnp.asarray(qs),
                                jnp.asarray(ep), jnp.asarray(es), valid, 8,
                                tile=512, interpret=True)
        sub = binned_topk_int4(jnp.asarray(qv), jnp.asarray(qs),
                               jnp.asarray(ep), jnp.asarray(es), valid, 8,
                               tile=512, inner=256, interpret=True)
        np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(sub[1]))

    def test_wide_tile_shift13_matches(self):
        # tile 8192 needs 13 column bits (score resolution ~2e-3); ids
        # must be exact and scores within the coarser key resolution
        rng = np.random.default_rng(15)
        emb = topk_ops.l2_normalize(rng.normal(size=(16384, 32)))
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        valid = np.ones(16384, dtype=bool)
        s_w, i_w = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                               jnp.asarray(valid), 10, tile=8192,
                               interpret=True)
        s_n, i_n = binned_topk(jnp.asarray(q), jnp.asarray(emb),
                               jnp.asarray(valid), 10, tile=2048,
                               interpret=True)
        for r in range(2):
            got = set(np.asarray(i_w)[r].tolist())
            want = set(np.asarray(i_n)[r].tolist())
            # both are binned approximations of the same corpus; the
            # planted-free random case should agree almost everywhere
            assert len(got & want) >= 8, (got, want)
        # rescore output is exact f32 for whatever ids were selected:
        # compare each returned score against the oracle dot product
        ids0 = np.asarray(i_w)[0]
        want = emb[ids0] @ q[0]
        np.testing.assert_allclose(np.asarray(s_w)[0], want, atol=1e-5)

    def test_scanned_bulk_matches_single(self):
        # one-execution bulk serving: scan over G chunks must equal G
        # independent calls
        from lattice_tpu.ops.pallas_topk import binned_topk_scanned
        rng = np.random.default_rng(21)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 32)))
        valid = jnp.asarray(np.ones(512, bool))
        q = rng.normal(size=(8, 32)).astype(np.float32)   # unnormalized
        q3 = jnp.asarray(q.reshape(2, 4, 32))
        s3, i3 = binned_topk_scanned(q3, jnp.asarray(emb), valid, 5,
                                     tile=128, interpret=True)
        for g in range(2):
            s1, i1 = binned_topk(jnp.asarray(
                topk_ops.l2_normalize(q[g * 4:(g + 1) * 4])),
                jnp.asarray(emb), valid, 5, tile=128, interpret=True)
            np.testing.assert_array_equal(np.asarray(i3[g]), np.asarray(i1))

    def test_fused_two_stage_scanned_matches(self):
        from lattice_tpu.ops.quant import (Int4View, _fused_two_stage,
                                           _fused_two_stage_scanned)
        rng = np.random.default_rng(22)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 32)))
        view = Int4View(emb)
        valid = jnp.asarray(np.ones(512, bool))
        fp = jnp.asarray(emb, dtype=jnp.float32)
        q = rng.normal(size=(8, 32)).astype(np.float32)
        q3 = jnp.asarray(q.reshape(2, 4, 32))
        s3, i3 = _fused_two_stage_scanned(
            q3, view.values, view._scales_col, valid, fp,
            k=5, k1=16, tile=128, bits=4, interpret=True)
        for g in range(2):
            s1, i1 = _fused_two_stage(
                jnp.asarray(q[g * 4:(g + 1) * 4]), view.values,
                view._scales_col, valid, fp, k=5, k1=16, tile=128, bits=4,
                interpret=True)
            np.testing.assert_array_equal(np.asarray(i3[g]), np.asarray(i1))

    def test_int4_binned_candidates(self):
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        rows = list(range(100, 110))
        emb, q = self._planted(1024, 64, rows, seed=3)
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        s1, c1 = binned_topk_int4(
            jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
            jnp.asarray(es), jnp.asarray(np.ones(1024, bool)), 10,
            tile=256, interpret=True)
        # near-duplicate run dominates; all 10 must survive the int4 scan
        assert set(rows) <= set(np.asarray(c1)[0].tolist())

    def test_int4_unpack_variants_bitwise_identical(self):
        """The MXU biased-nibble identity (unpack='matmul') must produce
        the SAME packed keys as the VPU unpack — exact integer math, so
        scores and candidate ids agree bitwise (interpret mode; measured
        identical on chip, R3_TPU_RESULTS6)."""
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        rng = np.random.default_rng(21)
        emb = topk_ops.l2_normalize(rng.normal(size=(1024, 64)))
        q = topk_ops.l2_normalize(rng.normal(size=(4, 64)))
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = jnp.asarray(np.ones(1024, bool))
        out = {}
        for unpack in ("vpu", "matmul"):
            out[unpack] = binned_topk_int4(
                jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
                jnp.asarray(es), valid, 10, tile=256, interpret=True,
                unpack=unpack, selection="mul")
        np.testing.assert_array_equal(np.asarray(out["vpu"][1]),
                                      np.asarray(out["matmul"][1]))
        np.testing.assert_array_equal(np.asarray(out["vpu"][0]),
                                      np.asarray(out["matmul"][0]))

    def test_int4_fma_selection_matches_mul(self):
        """The hoisted-scale fma chain (default) must agree with the
        original mul chain: same integer dot, different (finer) score
        truncation — winner sets match on separated data, stage scores
        within the coarser chain's resolution, invalid rows never
        surface, and true near-duplicates always survive."""
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        rng = np.random.default_rng(33)
        rows = list(range(40, 50))
        emb, q = self._planted(1024, 64, rows, seed=5)
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = np.ones(1024, bool)
        valid[rng.integers(0, 1024, 100)] = False
        for r in rows:
            valid[r] = True
        args = (jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
                jnp.asarray(es), jnp.asarray(valid))
        s_f, i_f = binned_topk_int4(*args, 10, tile=256, interpret=True,
                                    selection="fma")
        s_m, i_m = binned_topk_int4(*args, 10, tile=256, interpret=True,
                                    selection="mul")
        i_f, i_m = np.asarray(i_f), np.asarray(i_m)
        s_f, s_m = np.asarray(s_f), np.asarray(s_m)
        assert set(rows) <= set(i_f[0].tolist())
        assert not (set(i_f[0].tolist()) & set(np.flatnonzero(~valid)))
        ref = {int(c): float(s) for c, s in zip(i_m[0], s_m[0])}
        for c, s in zip(i_f[0], s_f[0]):
            if int(c) in ref:
                assert abs(ref[int(c)] - float(s)) < 2e-3

    def test_int4_hoistq_selection_matches_mul(self):
        """`selection="hoistq"` = fma's hoisted scale + in-fma bias at
        mul's VMEM footprint (where-mask, no bias slab): winner sets and
        restored stage scores must agree with mul within the packed
        truncation, invalid rows never surface."""
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        rng = np.random.default_rng(33)
        rows = list(range(40, 50))
        emb, q = self._planted(1024, 64, rows, seed=5)
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = np.ones(1024, bool)
        valid[rng.integers(0, 1024, 100)] = False
        for r in rows:
            valid[r] = True
        args = (jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
                jnp.asarray(es), jnp.asarray(valid))
        s_h, i_h = binned_topk_int4(*args, 10, tile=256, interpret=True,
                                    selection="hoistq")
        s_m, i_m = binned_topk_int4(*args, 10, tile=256, interpret=True,
                                    selection="mul")
        i_h, i_m = np.asarray(i_h), np.asarray(i_m)
        s_h, s_m = np.asarray(s_h), np.asarray(s_m)
        assert set(rows) <= set(i_h[0].tolist())
        assert not (set(i_h[0].tolist()) & set(np.flatnonzero(~valid)))
        ref = {int(c): float(s) for c, s in zip(i_m[0], s_m[0])}
        for c, s in zip(i_h[0], s_h[0]):
            if int(c) in ref:
                assert abs(ref[int(c)] - float(s)) < 2e-3

    def test_int4_hoistq_all_negative_scores(self):
        """Anti-correlated corpus through the hoistq chain: the
        (true + 2)/qs packing must stay positive-ordered even when every
        true score is negative, and invalid handling must come from the
        where-mask (not an additive column)."""
        from lattice_tpu.ops.quant import (quantize_rows,
                                           quantize_rows_int4, unpack_int4)
        rng = np.random.default_rng(7)
        base = topk_ops.l2_normalize(rng.normal(size=(1, 64)))
        noise = rng.normal(size=(256, 64)) * 0.05
        emb = topk_ops.l2_normalize(-np.abs(rng.normal()) * base + noise)
        emb = topk_ops.l2_normalize(
            np.where(emb @ base.T > 0, -emb, emb))   # all anti-aligned
        q = base
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = np.ones(256, bool)
        valid[rng.integers(0, 256, 30)] = False
        s_h, i_h = binned_topk_int4(
            jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
            jnp.asarray(es), jnp.asarray(valid), 8, tile=128,
            interpret=True, selection="hoistq")
        s_h, i_h = np.asarray(s_h), np.asarray(i_h)
        assert (s_h[0] < 0).all()
        assert not (set(i_h[0].tolist()) & set(np.flatnonzero(~valid)))
        deq = np.asarray(unpack_int4(jnp.asarray(ep))).astype(np.float32)
        deq = deq * np.asarray(es)[:, None]
        qd = np.asarray(qv)[0].astype(np.float32) * float(np.asarray(qs)[0])
        exact = deq @ qd
        exact[~valid] = -np.inf
        want = set(np.argsort(exact)[-8:].tolist())
        got = set(i_h[0].tolist())
        assert len(want & got) >= 7   # packed truncation may swap 1 near-tie

    def test_int4_fma_all_negative_scores(self):
        """Anti-correlated corpus: every true score is negative. The
        hoisted (true+2)/qs packing must stay positive and keep exact
        ordering (the naive hoist, acc*es alone, would bitcast negative
        floats and reverse their order)."""
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        rng = np.random.default_rng(7)
        base = topk_ops.l2_normalize(rng.normal(size=(1, 64)))
        noise = rng.normal(size=(256, 64)) * 0.05
        emb = topk_ops.l2_normalize(-np.abs(rng.normal()) * base + noise)
        emb = topk_ops.l2_normalize(
            np.where(emb @ base.T > 0, -emb, emb))   # all anti-aligned
        q = base
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = jnp.asarray(np.ones(256, bool))
        s_f, i_f = binned_topk_int4(
            jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
            jnp.asarray(es), valid, 8, tile=128, interpret=True,
            selection="fma")
        assert (np.asarray(s_f)[0] < 0).all()
        # oracle: dequantized int4 scores, exact
        from lattice_tpu.ops.quant import unpack_int4
        deq = np.asarray(unpack_int4(jnp.asarray(ep))).astype(np.float32)
        deq = deq * np.asarray(es)[:, None]
        qd = np.asarray(qv)[0].astype(np.float32) * float(np.asarray(qs)[0])
        exact = deq @ qd
        want = set(np.argsort(exact)[-8:].tolist())
        got = set(np.asarray(i_f)[0].tolist())
        assert len(want & got) >= 7   # packed truncation may swap 1 near-tie

    def test_int4_kernel_matches_xla_fallback(self):
        # identical integer math in the Pallas kernel and the XLA unpack
        # path: winner scores for shared ids must agree exactly
        from lattice_tpu.ops.quant import (int4_topk, quantize_rows,
                                           quantize_rows_int4)
        rng = np.random.default_rng(11)
        emb = topk_ops.l2_normalize(rng.normal(size=(512, 64)))
        q = topk_ops.l2_normalize(rng.normal(size=(2, 64)))
        ep, es = quantize_rows_int4(emb)
        qv, qs = quantize_rows(q)
        valid = jnp.asarray(np.ones(512, bool))
        s_pl, i_pl = binned_topk_int4(
            jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
            jnp.asarray(es), valid, 8, tile=128, interpret=True)
        s_xla, i_xla = int4_topk(
            jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(ep),
            jnp.asarray(es), valid, 16)
        ref = {int(c): float(s)
               for c, s in zip(np.asarray(i_xla).ravel(),
                               np.asarray(s_xla).ravel())}
        for c, s in zip(np.asarray(i_pl).ravel(), np.asarray(s_pl).ravel()):
            if int(c) in ref:
                # packed keys truncate to ~11 mantissa bits (~1e-3)
                assert abs(ref[int(c)] - float(s)) < 2e-3


class TestKMeans:
    def test_recovers_clusters(self):
        data, true_assign = clustered_data(600, 32, 4, spread=0.05)
        valid = np.ones(600, dtype=bool)
        centroids, assign = kmeans_fit(
            jnp.asarray(data), jnp.asarray(valid),
            jnp.asarray(np.arange(4, dtype=np.int32) * 150), 4, iters=15)
        assign = np.asarray(assign)
        # cluster labels are permuted; check purity instead
        purity = 0
        for c in range(4):
            members = true_assign[assign == c]
            if len(members):
                purity += np.bincount(members).max()
        assert purity / len(data) > 0.95

    def test_centroids_normalized(self):
        data, _ = clustered_data(200, 16, 3)
        centroids, _ = kmeans_fit(
            jnp.asarray(data), jnp.asarray(np.ones(200, bool)),
            jnp.asarray(np.array([0, 50, 100], np.int32)), 3, iters=5)
        norms = np.linalg.norm(np.asarray(centroids), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestIVF:
    @pytest.fixture(scope="class")
    def corpus(self):
        data, _ = clustered_data(3000, 64, 24, spread=0.3)
        valid = np.ones(3000, dtype=bool)
        valid[[7, 2000]] = False
        return data, valid

    def test_full_probe_equals_exact(self, corpus):
        data, valid = corpus
        index = IVFIndex.build(data, valid, n_clusters=16, dtype="float32")
        q = topk_ops.l2_normalize(np.random.default_rng(5).normal(size=(4, 64)))
        s, i = index.search(q, k=10, nprobe=16)
        o_s, o_i = topk_ops.topk_oracle(q, data, valid, 10)
        np.testing.assert_allclose(s, o_s, atol=1e-4)
        for got, want in zip(i, o_i):
            assert set(got.tolist()) == set(want.tolist())

    def test_recall_at_low_nprobe(self, corpus):
        data, valid = corpus
        index = IVFIndex.build(data, valid, n_clusters=24, dtype="float32")
        rng = np.random.default_rng(6)
        # queries near corpus points (realistic retrieval)
        q = topk_ops.l2_normalize(
            data[rng.integers(0, 3000, 32)] + 0.1 * rng.normal(size=(32, 64)))
        _, o_i = topk_ops.topk_oracle(q, data, valid, 10)

        def recall_at(nprobe):
            _, i = index.search(q, k=10, nprobe=nprobe)
            return np.mean([
                len(set(i[r].tolist()) & set(o_i[r].tolist())) / 10
                for r in range(len(q))
            ])

        # monotone recall/nprobe tradeoff on overlapping clusters
        assert recall_at(6) >= 0.75
        assert recall_at(12) >= 0.9
        assert recall_at(24) == 1.0

    def test_invalid_rows_never_returned(self, corpus):
        data, valid = corpus
        index = IVFIndex.build(data, valid, n_clusters=16, dtype="float32")
        q = topk_ops.l2_normalize(np.random.default_rng(7).normal(size=(2, 64)))
        _, i = index.search(q, k=50, nprobe=16)
        assert 7 not in i and 2000 not in i and -1 not in i

    def test_fused_kernel_matches_xla_path(self, corpus):
        # the TPU-dispatch fused probe kernel, run in pallas interpret
        # mode, must agree with the one-hot-gather XLA path and (at full
        # probe) with the exact oracle
        from lattice_tpu.ops.ivf import ivf_search_batch, ivf_search_fused
        data, valid = corpus
        index = IVFIndex.build(data, valid, n_clusters=16, dtype="float32")
        q = jnp.asarray(topk_ops.l2_normalize(
            np.random.default_rng(11).normal(size=(6, 64))))
        f_s, f_i = ivf_search_fused(
            q, index.centroids, index.bucket_data, index.bucket_ids,
            nprobe=6, k=10, interpret=True)
        x_s, x_i = ivf_search_batch(
            q, index.centroids, index.bucket_data, index.bucket_ids,
            index.bucket_valid, k=10, nprobe=6)
        np.testing.assert_allclose(np.asarray(f_s), np.asarray(x_s), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(f_i), np.asarray(x_i))
        # full probe == exact search
        f_s, f_i = ivf_search_fused(
            q, index.centroids, index.bucket_data, index.bucket_ids,
            nprobe=16, k=10, interpret=True)
        o_s, o_i = topk_ops.topk_oracle(np.asarray(q), data, valid, 10)
        np.testing.assert_allclose(np.asarray(f_s), o_s, atol=1e-4)
        for got, want in zip(np.asarray(f_i), o_i):
            assert set(got.tolist()) == set(want.tolist())
        # padded rows (id -1) never surface
        assert (np.asarray(f_i) >= 0).all()

    def test_batching_invariant(self, corpus):
        # search() chunks queries by max_batch (the fused kernel bounds
        # B*nprobe for VMEM); results must not depend on the chunking.
        data, valid = corpus
        index = IVFIndex.build(data, valid, n_clusters=16, dtype="float32")
        q = topk_ops.l2_normalize(np.random.default_rng(9).normal(size=(11, 64)))
        s_ref, i_ref = index.search(q, k=10, nprobe=8)
        for mb in (1, 3, 32):
            s, i = index.search(q, k=10, nprobe=8, max_batch=mb)
            np.testing.assert_allclose(s, s_ref, atol=1e-5)
            np.testing.assert_array_equal(i, i_ref)
        # single query (the CLI path) returns [1, k]
        s1, i1 = index.search(q[:1], k=10, nprobe=8)
        assert s1.shape == (1, 10) and i1.shape == (1, 10)
        np.testing.assert_array_equal(i1[0], i_ref[0])

    def test_memory_accounting(self, corpus):
        data, valid = corpus
        index = IVFIndex.build(data, valid, n_clusters=16, dtype="bfloat16")
        assert index.memory_bytes() > 0
        assert index.bucket_size % 8 == 0


class TestDeviceBuild:
    def test_build_from_device_matches_host_build(self):
        import jax.numpy as jnp
        data, _ = clustered_data(800, 32, 8, spread=0.15)
        valid = np.ones(800, dtype=bool)
        valid[5] = False
        host_index = IVFIndex.build(data, valid, n_clusters=8,
                                    dtype="float32", iters=8)
        dev_index = IVFIndex.build_from_device(
            jnp.asarray(data), valid, n_clusters=8, dtype="float32", iters=8)
        q = topk_ops.l2_normalize(
            np.random.default_rng(3).normal(size=(4, 32)))
        hs, hi = host_index.search(q, k=10, nprobe=8)
        ds, di = dev_index.search(q, k=10, nprobe=8)
        # full probe => both exact
        o_s, o_i = topk_ops.topk_oracle(q, data, valid, 10)
        for got, want in zip(di, o_i):
            assert set(got.tolist()) == set(want.tolist())
        np.testing.assert_allclose(ds, o_s, atol=1e-4)


class TestCappedLayout:
    def _skewed(self, n=4000, d=32, seed=0):
        """One dominant mode (60% of rows) + small satellites — the shape
        real code embeddings take (utility code dominates)."""
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(8, d))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        probs = np.array([0.6] + [0.4 / 7] * 7)
        assign = rng.choice(8, size=n, p=probs)
        return topk_ops.l2_normalize(
            centers[assign] + 0.2 * rng.normal(size=(n, d)))

    def test_cap_bounds_padding_waste(self):
        data = self._skewed()
        valid = np.ones(len(data), bool)

        def waste(max_load):
            idx = IVFIndex.build(data, valid, n_clusters=32,
                                 max_load=max_load)
            return (idx.n_clusters * idx.bucket_size / valid.sum(), idx)

        w0, _ = waste(None)
        w1, idx1 = waste(2.0)
        assert w0 > 2.0, w0            # the skew is real without the cap
        assert w1 <= 2.4, w1           # 2.0 + sublane rounding
        assert w1 < w0
        # every row stays findable and recall survives the rebalance
        ids = np.asarray(idx1.bucket_ids)
        assert set(ids[ids >= 0].tolist()) == set(range(len(data)))
        r = idx1.measure_recall(jnp.asarray(data), jnp.asarray(valid),
                                nprobe=8)
        assert r >= 0.9, r

    def test_cap_noop_for_uniform_corpora(self):
        data, _ = clustered_data(2048, 32, 16, spread=0.2, seed=3)
        valid = np.ones(len(data), bool)
        a = IVFIndex.build(data, valid, n_clusters=16, max_load=None)
        b = IVFIndex.build(data, valid, n_clusters=16, max_load=2.0)
        ra = a.measure_recall(jnp.asarray(data), jnp.asarray(valid), nprobe=4)
        rb = b.measure_recall(jnp.asarray(data), jnp.asarray(valid), nprobe=4)
        assert abs(ra - rb) < 0.08, (ra, rb)


class TestPipelineEmbeddingRecall:
    """VERDICT r1 #9: IVF recall on embeddings the REAL pipeline produces
    (scan -> parse -> chunk -> hash-embed the golden fixture), not
    synthetic gaussians.

    The corpus is the PINNED golden_project fixture, not this repo's own
    live source: indexing the repo made the test's input drift with every
    commit, and at ~3k chunks the recall sat so close to the 0.9 floor
    that ordinary development flipped it (measured 0.9+ -> 0.8922 from
    ~590 new source lines, none touching IVF — r4 session)."""

    @pytest.fixture(scope="class")
    def corpus(self):
        from pathlib import Path
        from lattice_tpu.embeddings.chunker import CodeChunker
        from lattice_tpu.parsing.parser import CodeParser
        from lattice_tpu.parsing.scanner import FileScanner
        from lattice_tpu.providers.hash_provider import HashEmbedder

        root = (Path(__file__).resolve().parent / "fixtures"
                / "golden_project")
        files = FileScanner(root).scan_all()
        parser, chunker = CodeParser(), CodeChunker()
        texts = []
        for fi in files:
            for c in chunker.chunk_file(parser.parse_file(fi)):
                texts.append(c.content)
        emb = HashEmbedder(dimensions=256)
        vecs = np.asarray(emb.embed_batch(texts), dtype=np.float32)
        return topk_ops.l2_normalize(vecs)

    def test_recall_at_nprobe8(self, corpus):
        valid = np.ones(len(corpus), bool)
        assert len(corpus) > 300   # the corpus is real and non-trivial
        idx = IVFIndex.build(corpus, valid)
        r = idx.measure_recall(jnp.asarray(corpus), jnp.asarray(valid),
                               nprobe=8)
        # measured 0.9391 on the pinned fixture (651 chunks); the floor
        # leaves slack for deliberate fixture edits, not for IVF drift
        assert r >= 0.9, r
        waste = idx.n_clusters * idx.bucket_size / valid.sum()
        assert waste < 2.6, waste


class TestEncoderEmbeddingRecall:
    """VERDICT r2 #8: IVF recall on TRANSFORMER-produced embeddings.

    Hash-embedder geometry is not transformer geometry — mean-pooled
    encoder outputs are strongly anisotropic (mean pairwise cosine ~0.8
    at random init vs ~0 for hash vectors), which stresses k-means
    bucketing very differently. Encodes the golden corpus with the Flax
    UniXcoder at a scaled-down config (same architecture/geometry; the
    full 12x768 takes minutes on 1 CPU core), random-init and after
    contrastive fine-tuning steps on pairs mined from the same corpus.
    """

    CFG = None  # built lazily (jax import order)

    @classmethod
    def _config(cls):
        from lattice_tpu.models.unixcoder import UniXcoderConfig
        if cls.CFG is None:
            cls.CFG = UniXcoderConfig(
                vocab_size=8192, hidden_size=256, num_layers=4,
                num_heads=4, intermediate_size=1024,
                max_position_embeddings=130)
        return cls.CFG

    @pytest.fixture(scope="class")
    def chunks(self):
        from pathlib import Path

        from lattice_tpu.embeddings.chunker import CodeChunker
        from lattice_tpu.parsing.parser import CodeParser
        from lattice_tpu.parsing.scanner import FileScanner

        root = Path(__file__).resolve().parent / "fixtures" / "golden_project"
        files = FileScanner(root).scan_all()
        parser, chunker = CodeParser(), CodeChunker()
        out = []
        for fi in files:
            out.extend(chunker.chunk_file(parser.parse_file(fi)))
        assert len(out) > 400
        return out

    def _encode(self, model, texts):
        from lattice_tpu.text.tokenizer import CodeTokenizer

        tok = CodeTokenizer(vocab_size=self._config().vocab_size)
        vecs = []
        for start in range(0, len(texts), 64):
            ids, mask = tok.encode_batch(texts[start:start + 64], 64)
            vecs.append(model.encode(np.asarray(ids), np.asarray(mask)))
        return topk_ops.l2_normalize(
            np.concatenate(vecs).astype(np.float32))

    def _measure(self, vecs):
        valid = np.ones(len(vecs), bool)
        idx = IVFIndex.build(vecs, valid)
        recall = idx.measure_recall(jnp.asarray(vecs), jnp.asarray(valid),
                                    nprobe=8)
        waste = idx.n_clusters * idx.bucket_size / valid.sum()
        return recall, waste

    def test_random_init_encoder_recall(self, chunks):
        from lattice_tpu.models.unixcoder import UniXcoderModel

        model = UniXcoderModel(self._config())
        vecs = self._encode(model, [c.content for c in chunks])
        # transformer anisotropy really present (the point of the test)
        sims = vecs[:50] @ vecs[50:250].T
        assert float(np.mean(sims)) > 0.4
        recall, waste = self._measure(vecs)
        assert recall >= 0.9, recall
        assert waste < 3.0, waste

    def test_finetuned_encoder_recall(self, chunks):
        """A few contrastive steps on pairs mined from the corpus must
        keep (or improve) IVF-compatible geometry."""
        from lattice_tpu.models.data import PairBatcher, TrainingPair
        from lattice_tpu.models.train import ContrastiveTrainer
        from lattice_tpu.models.unixcoder import UniXcoderModel
        from lattice_tpu.text.tokenizer import CodeTokenizer

        pairs = [
            TrainingPair(anchor=(c.name or c.content.split("\n", 1)[0]),
                         positive=c.content, source="test")
            for c in chunks if len(c.content) >= 40
        ][:256]
        assert len(pairs) >= 64
        cfg = self._config()
        tok = CodeTokenizer(vocab_size=cfg.vocab_size)
        batcher = PairBatcher(pairs, tok, batch_size=16, max_length=64,
                              seed=0)
        trainer = ContrastiveTrainer(cfg, learning_rate=1e-4, seed=0)
        losses = []
        for i, batch in enumerate(batcher.batches()):
            losses.append(trainer.train_step(batch))
            if i >= 3:
                break
        assert np.isfinite(losses).all()
        model = UniXcoderModel(cfg)
        model.params = trainer.state.params
        vecs = self._encode(model, [c.content for c in chunks])
        recall, waste = self._measure(vecs)
        assert recall >= 0.9, recall
        assert waste < 3.0, waste
