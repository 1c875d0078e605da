"""Fused Pallas attention vs decoder.attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aocr.models import decoder
from aocr.ops.pallas import attention as pattn


@pytest.mark.parametrize("B,L,H", [(8, 6, 128), (128, 24, 256)])
def test_fused_attention_matches(rng, B, L, H):
    params = decoder.init_params(rng, 13, 8, H, 2, False)
    h_top = jax.random.normal(jax.random.PRNGKey(1), (B, H))
    context = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))
    ref, _alpha = decoder.attention(params, h_top, context)
    out = pattn.fused_attention(
        h_top, context, params["w_a"], params["w_c"], interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_fused_attention_bf16(rng):
    B, L, H = 8, 6, 128
    params = decoder.init_params(rng, 13, 8, H, 2, False)
    h_top = jax.random.normal(jax.random.PRNGKey(1), (B, H))
    context = jax.random.normal(jax.random.PRNGKey(2), (B, L, H))
    ref, _ = decoder.attention(params, h_top, context,
                               compute_dtype=jnp.bfloat16)
    out = pattn.fused_attention(
        h_top, context,
        params["w_a"].astype(jnp.bfloat16),
        params["w_c"].astype(jnp.bfloat16),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
