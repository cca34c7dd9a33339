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
