"""Device top-k kernels vs the NumPy oracle.

SURVEY §4 implication: the oracle plays the role of the reference's mocked
Qdrant; kernels must match it exactly on the CPU-runnable path.
"""

import numpy as np
import pytest

from lattice_tpu.ops import topk as topk_ops


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    emb = topk_ops.l2_normalize(rng.normal(size=(257, 64)))
    queries = topk_ops.l2_normalize(rng.normal(size=(5, 64)))
    valid = np.ones(257, dtype=bool)
    valid[13] = valid[200] = False
    return queries, emb, valid


class TestFlatTopK:
    def test_matches_oracle(self, corpus):
        import jax.numpy as jnp
        queries, emb, valid = corpus
        scores, idx = topk_ops.flat_topk(
            jnp.asarray(queries), jnp.asarray(emb), jnp.asarray(valid), 10)
        o_scores, o_idx = topk_ops.topk_oracle(queries, emb, valid, 10)
        # score values must agree to float tolerance
        np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)
        # index sets must agree (ties may reorder)
        for row_dev, row_oracle in zip(np.asarray(idx), o_idx):
            assert set(row_dev.tolist()) == set(row_oracle.tolist())

    def test_invalid_rows_never_returned(self, corpus):
        import jax.numpy as jnp
        queries, emb, valid = corpus
        _, idx = topk_ops.flat_topk(
            jnp.asarray(queries), jnp.asarray(emb), jnp.asarray(valid), 50)
        assert 13 not in np.asarray(idx)
        assert 200 not in np.asarray(idx)

    def test_filtered(self, corpus):
        import jax.numpy as jnp
        queries, emb, valid = corpus
        fmask = np.zeros(257, dtype=bool)
        fmask[:40] = True
        scores, idx = topk_ops.flat_topk_filtered(
            jnp.asarray(queries), jnp.asarray(emb), jnp.asarray(valid),
            jnp.asarray(fmask), 10)
        assert np.asarray(idx).max() < 40
        o_scores, o_idx = topk_ops.topk_oracle(queries, emb, valid, 10, fmask)
        np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)

    def test_bf16_storage_close_to_oracle(self, corpus):
        import jax.numpy as jnp
        queries, emb, valid = corpus
        emb_bf16 = jnp.asarray(emb, dtype=jnp.bfloat16)
        scores, idx = topk_ops.flat_topk(
            jnp.asarray(queries), emb_bf16, jnp.asarray(valid), 10)
        o_scores, _ = topk_ops.topk_oracle(queries, emb, valid, 10)
        # bf16 rounding: scores agree to ~1e-2
        np.testing.assert_allclose(np.asarray(scores), o_scores, atol=2e-2)

    def test_merge_topk_equals_global(self, corpus):
        import jax.numpy as jnp
        queries, emb, valid = corpus
        half = 128
        s_a, i_a = topk_ops.flat_topk(
            jnp.asarray(queries), jnp.asarray(emb[:half]),
            jnp.asarray(valid[:half]), 10)
        s_b, i_b = topk_ops.flat_topk(
            jnp.asarray(queries), jnp.asarray(emb[half:]),
            jnp.asarray(valid[half:]), 10)
        merged_s, merged_i = topk_ops.merge_topk(s_a, i_a, s_b, i_b + half, 10)
        o_scores, o_idx = topk_ops.topk_oracle(queries, emb, valid, 10)
        np.testing.assert_allclose(np.asarray(merged_s), o_scores, atol=1e-5)
        for row_dev, row_oracle in zip(np.asarray(merged_i), o_idx):
            assert set(row_dev.tolist()) == set(row_oracle.tolist())

    @pytest.mark.parametrize("block", [4, 16, 64, 100, 257, 1024])
    def test_blocked_equals_flat(self, corpus, block):
        """The memory-bounded oracle must be exact for ANY block split,
        including blocks smaller than k (block=4 < k=10 hits the
        pad-to-k path on EVERY block), a block that does not divide N,
        and block >= N (single call)."""
        import jax.numpy as jnp
        queries, emb, valid = corpus
        bs, bi = topk_ops.flat_topk_blocked(
            jnp.asarray(queries), jnp.asarray(emb, jnp.bfloat16),
            jnp.asarray(valid), 10, block=block)
        o_scores, o_idx = topk_ops.topk_oracle(queries, emb, valid, 10)
        # bf16 storage scored in f32: values close, sets may flip on
        # near-ties — require score agreement at bf16 tolerance and
        # overlap >= 9/10 like the storage-precision test above
        np.testing.assert_allclose(np.asarray(bs), o_scores, atol=8e-3)
        for row_dev, row_oracle in zip(np.asarray(bi), o_idx):
            assert len(set(row_dev.tolist())
                       & set(row_oracle.tolist())) >= 9

    def test_blocked_equals_flat_exact_f32(self, corpus):
        """At f32 storage the blocked oracle equals flat_topk exactly."""
        import jax.numpy as jnp
        queries, emb, valid = corpus
        fs, fi = topk_ops.flat_topk(
            jnp.asarray(queries), jnp.asarray(emb), jnp.asarray(valid), 10)
        bs, bi = topk_ops.flat_topk_blocked(
            jnp.asarray(queries), jnp.asarray(emb), jnp.asarray(valid),
            10, block=97)
        np.testing.assert_allclose(np.asarray(bs), np.asarray(fs),
                                   atol=1e-6)
        for a, b in zip(np.asarray(bi), np.asarray(fi)):
            assert set(a.tolist()) == set(b.tolist())


class TestQuantized:
    def test_int8_topk_close_to_exact(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import QuantizedView, quantize_rows
        rng = np.random.default_rng(0)
        emb = topk_ops.l2_normalize(rng.normal(size=(500, 64)))
        valid = np.ones(500, dtype=bool)
        valid[100] = False
        q = topk_ops.l2_normalize(rng.normal(size=(4, 64)))
        view = QuantizedView(emb)
        s, i = view.search(q, jnp.asarray(valid), k=10)
        o_s, o_i = topk_ops.topk_oracle(q, emb, valid, 10)
        # quantized recall@10 vs exact should be near-perfect
        recall = np.mean([
            len(set(i[r].tolist()) & set(o_i[r].tolist())) / 10
            for r in range(4)
        ])
        assert recall >= 0.9
        np.testing.assert_allclose(s, o_s, atol=5e-2)
        assert 100 not in i

    def test_rescore_recovers_exact_order(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import QuantizedView
        rng = np.random.default_rng(1)
        emb = topk_ops.l2_normalize(rng.normal(size=(400, 32)))
        valid = np.ones(400, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(3, 32)))
        view = QuantizedView(emb)
        s, i = view.search(q, jnp.asarray(valid), k=5,
                           full_precision=jnp.asarray(emb, dtype=jnp.float32),
                           rescore_factor=8)
        o_s, o_i = topk_ops.topk_oracle(q, emb, valid, 5)
        for got, want in zip(i, o_i):
            assert set(got.tolist()) == set(want.tolist())
        np.testing.assert_allclose(s, o_s, atol=1e-5)

    def test_rescore_never_promotes_invalid(self):
        # fewer valid rows than rescore_factor*k: first-stage pad slots
        # carry garbage ids and must stay -inf through the rescore
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import QuantizedView
        rng = np.random.default_rng(9)
        emb = topk_ops.l2_normalize(rng.normal(size=(300, 32)))
        valid = np.zeros(300, dtype=bool)
        keep = [5, 60, 150, 299]
        valid[keep] = True
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        view = QuantizedView(emb)
        s, i = view.search(q, jnp.asarray(valid), k=8,
                           full_precision=jnp.asarray(emb, dtype=jnp.float32),
                           rescore_factor=4)
        real = s > -1e29
        assert real.sum(axis=1).tolist() == [4, 4]
        for row in range(2):
            assert set(i[row][real[row]].tolist()) <= set(keep)

    def test_memory_halves(self):
        from lattice_tpu.ops.quant import QuantizedView
        emb = np.random.default_rng(2).normal(size=(256, 64)).astype(np.float32)
        view = QuantizedView(emb)
        bf16_bytes = emb.size * 2
        assert view.memory_bytes() < 0.6 * bf16_bytes

    def test_quantize_roundtrip_error_bounded(self):
        from lattice_tpu.ops.quant import quantize_rows
        emb = topk_ops.l2_normalize(
            np.random.default_rng(3).normal(size=(50, 64)))
        values, scales = quantize_rows(emb)
        recon = values.astype(np.float32) * scales[:, None]
        assert np.abs(recon - emb).max() < 0.01


class TestInt4:
    def test_pack_unpack_roundtrip(self):
        from lattice_tpu.ops.quant import (quantize_rows_int4,
                                           unpack_int4, unpack_int4_oracle)
        emb = topk_ops.l2_normalize(
            np.random.default_rng(4).normal(size=(50, 64)))
        packed, scales = quantize_rows_int4(emb)
        assert packed.shape == (50, 32) and packed.dtype == np.int8
        u_np = unpack_int4_oracle(packed)
        u_dev = np.asarray(unpack_int4(np.asarray(packed)))
        np.testing.assert_array_equal(u_np, u_dev)
        assert u_np.min() >= -7 and u_np.max() <= 7
        recon = u_np.astype(np.float32) * scales[:, None]
        # int4 step = scale; max rounding error = scale/2 <= amax/14
        assert np.abs(recon - emb).max() < np.abs(emb).max() / 13

    def test_device_pack_matches_host(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import (quantize_rows_int4,
                                           quantize_rows_int4_device)
        emb = topk_ops.l2_normalize(
            np.random.default_rng(5).normal(size=(40, 32)))
        p_h, s_h = quantize_rows_int4(emb)
        p_d, s_d = quantize_rows_int4_device(jnp.asarray(emb))
        np.testing.assert_array_equal(p_h, np.asarray(p_d))
        np.testing.assert_allclose(s_h, np.asarray(s_d), rtol=1e-6)

    def test_int4_search_close_to_exact(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import Int4View
        rng = np.random.default_rng(6)
        emb = topk_ops.l2_normalize(rng.normal(size=(500, 64)))
        valid = np.ones(500, dtype=bool)
        valid[100] = False
        q = topk_ops.l2_normalize(rng.normal(size=(4, 64)))
        view = Int4View(emb)
        s, i = view.search(q, jnp.asarray(valid), k=10)
        o_s, o_i = topk_ops.topk_oracle(q, emb, valid, 10)
        recall = np.mean([
            len(set(i[r].tolist()) & set(o_i[r].tolist())) / 10
            for r in range(4)
        ])
        assert recall >= 0.7, recall        # int4 first stage, no rescore
        assert 100 not in i

    def test_int4_rescore_recovers_exact_order(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import Int4View
        rng = np.random.default_rng(7)
        emb = topk_ops.l2_normalize(rng.normal(size=(400, 32)))
        valid = np.ones(400, dtype=bool)
        q = topk_ops.l2_normalize(rng.normal(size=(3, 32)))
        view = Int4View(emb)
        s, i = view.search(q, jnp.asarray(valid), k=5,
                           full_precision=jnp.asarray(emb, dtype=jnp.float32),
                           rescore_factor=8)
        o_s, o_i = topk_ops.topk_oracle(q, emb, valid, 5)
        recall = np.mean([
            len(set(got.tolist()) & set(want.tolist())) / 5
            for got, want in zip(i, o_i)])
        assert recall >= 0.85, recall
        # whatever survived the first stage is exactly scored
        for row in range(3):
            want = {int(c): float(v) for c, v in zip(o_i[row], o_s[row])}
            for c, v in zip(i[row], s[row]):
                if int(c) in want:
                    assert abs(want[int(c)] - float(v)) < 1e-5

    def test_int4_dequant_rescore_beats_first_stage(self):
        """Capacity mode (r5): NO bf16 resident — rescore the widened
        winners from the packed rows themselves. Must beat the raw
        first-stage ordering (which quantizes the query to int8 and
        selects through bin-max keys) and stay masked/valid-safe."""
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import Int4View, unpack_int4_oracle
        rng = np.random.default_rng(21)
        emb = topk_ops.l2_normalize(rng.normal(size=(800, 64)))
        valid = np.ones(800, dtype=bool)
        valid[5] = False
        q = topk_ops.l2_normalize(rng.normal(size=(8, 64)))
        view = Int4View(emb)
        vd = jnp.asarray(valid)
        qd = jnp.asarray(q, jnp.float32)
        _, i_first = view.search_device(qd, vd, 10)
        _, i_resc = view.search_device(qd, vd, 10, dequant_rescore=True)
        i_first, i_resc = np.asarray(i_first), np.asarray(i_resc)
        _, o_i = topk_ops.topk_oracle(q, emb, valid, 10)

        def recall(i_got):
            return np.mean([
                len(set(i_got[r].tolist()) & set(o_i[r].tolist())) / 10
                for r in range(8)])

        # the information CEILING: exact f32 scoring over the fully
        # dequantized int4 matrix (what the rescore could achieve with
        # an infinite candidate set) — at d=64 the int4 step itself
        # bounds recall well below 1.0, so assert against the ceiling,
        # not an absolute number
        deq = (unpack_int4_oracle(np.asarray(view.values)).astype(np.float32)
               * np.asarray(view.scales)[:, None])
        _, ceil_i = topk_ops.topk_oracle(q, deq, valid, 10)
        r_ceiling = np.mean([
            len(set(ceil_i[r].tolist()) & set(o_i[r].tolist())) / 10
            for r in range(8)])
        r_first, r_resc = recall(i_first), recall(i_resc)
        assert r_resc >= r_first, (r_resc, r_first)
        assert r_resc >= r_ceiling - 0.05, (r_resc, r_ceiling)
        assert 5 not in i_resc

    def test_int4_dequant_rescore_scores_are_dequant_cosines(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import (Int4View, unpack_int4_oracle)
        rng = np.random.default_rng(22)
        emb = topk_ops.l2_normalize(rng.normal(size=(300, 32)))
        q = topk_ops.l2_normalize(rng.normal(size=(2, 32)))
        view = Int4View(emb)
        s, i = view.search_device(jnp.asarray(q, jnp.float32),
                                  jnp.asarray(np.ones(300, bool)), 5,
                                  dequant_rescore=True)
        s, i = np.asarray(s), np.asarray(i)
        deq = (unpack_int4_oracle(np.asarray(view.values)).astype(np.float32)
               * np.asarray(view.scales)[:, None])
        for r in range(2):
            want = deq[i[r]] @ q[r]
            np.testing.assert_allclose(s[r], want, atol=1e-4)

    def test_unnormalized_queries_score_as_cosines(self):
        # ChunkStore passes RAW queries on every route now; the views'
        # non-fused fallback must normalize too (review finding: scores
        # came back scaled by ||q|| on the off-TPU path)
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import Int4View, QuantizedView
        rng = np.random.default_rng(14)
        emb = topk_ops.l2_normalize(rng.normal(size=(200, 32)))
        valid = jnp.asarray(np.ones(200, bool))
        q = 3.7 * emb[:2]                       # non-unit queries
        for view in (QuantizedView(emb), Int4View(emb)):
            s, i = view.search(q, valid, k=3,
                               full_precision=jnp.asarray(emb, jnp.float32))
            assert int(i[0, 0]) == 0 and int(i[1, 0]) == 1
            assert s.max() <= 1.0 + 1e-4, float(s.max())

    def test_memory_quarters(self):
        from lattice_tpu.ops.quant import Int4View
        emb = np.random.default_rng(8).normal(size=(256, 64)).astype(np.float32)
        view = Int4View(emb)
        bf16_bytes = emb.size * 2
        assert view.memory_bytes() < 0.3 * bf16_bytes

    def test_update_rows_delta(self):
        import jax.numpy as jnp
        from lattice_tpu.ops.quant import Int4View
        rng = np.random.default_rng(10)
        emb = topk_ops.l2_normalize(rng.normal(size=(200, 32)))
        view = Int4View(emb)
        q = topk_ops.l2_normalize(rng.normal(size=(1, 32)))
        # plant the query itself at row 7 via the delta path
        view.update_rows(jnp.asarray(q), jnp.asarray([7]))
        s, i = view.search(q, jnp.asarray(np.ones(200, bool)), k=1)
        assert int(i[0, 0]) == 7
