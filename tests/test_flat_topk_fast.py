"""Fast (packed-key) kernel mode: exact set recall, quantized ordering."""
import numpy as np
import jax.numpy as jnp
import pytest

from persian_rag_tpu.ops.flat_topk import flat_topk_pallas, flat_topk_ref


@pytest.mark.parametrize("metric", ["dot", "l2"])
@pytest.mark.parametrize("n,q,k", [(700, 9, 10), (3000, 5, 7), (150, 3, 10)])
def test_fast_mode_set_recall_is_exact(rng, metric, n, q, k):
    corpus = rng.standard_normal((n, 64)).astype(np.float32)
    queries = rng.standard_normal((q, 64)).astype(np.float32)
    want_s, want_i = flat_topk_ref(
        jnp.asarray(queries), jnp.asarray(corpus), k, metric
    )
    got_s, got_i = flat_topk_pallas(
        jnp.asarray(queries),
        jnp.asarray(corpus),
        k,
        metric,
        tile_n=256,
        tile_q=8,
        mode="fast",
        interpret=True,
    )
    want_s, want_i = np.asarray(want_s), np.asarray(want_i)
    got_s, got_i = np.asarray(got_s), np.asarray(got_i)
    for qq in range(q):
        # identical member set; ordering may permute inside quantization
        # ties (scores quantized to 21 bits, ~2^-12 relative)
        assert set(got_i[qq]) == set(want_i[qq]), qq
        np.testing.assert_allclose(
            np.sort(got_s[qq]), np.sort(want_s[qq]), rtol=3e-4, atol=1e-3
        )


def test_fast_mode_scores_monotone(rng):
    corpus = rng.standard_normal((500, 32)).astype(np.float32)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    s, _ = flat_topk_pallas(
        jnp.asarray(queries), jnp.asarray(corpus), 10, "dot",
        tile_n=128, tile_q=8, mode="fast", interpret=True,
    )
    s = np.asarray(s)
    assert (np.diff(s, axis=1) <= 1e-6).all()
