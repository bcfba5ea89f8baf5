"""ViT remat/--use-checkpoint ladder validation (ADVICE r3 #2): a typo
like 'flsh' must error, not silently run full per-block remat."""

import jax
import jax.numpy as jnp
import pytest

from sm3x.models.vit import ViT


def _tiny(remat):
    return ViT(patch=4, dim=16, depth=1, n_heads=2, dtype=jnp.float32,
               remat=remat)


def test_unknown_remat_string_raises():
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    for bad in ("flsh", "atn", "full", "none"):
        with pytest.raises(ValueError, match="unknown remat"):
            _tiny(bad).init(jax.random.PRNGKey(0), x)


def test_known_remat_values_accepted():
    x = jnp.zeros((2, 8, 8, 3), jnp.float32)
    for ok in (False, True, "dots", "attn", "flash"):
        v = _tiny(ok).init(jax.random.PRNGKey(0), x)
        assert "params" in v
