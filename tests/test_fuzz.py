"""Randomized arch-DSL fuzzing: any generatable arch must parse, init,
apply with the analytically expected output shape, and (for small cases)
match the NumPy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fast_artistic_videos_tpu.models import arch_dsl, stylizer
from tests.test_oracle import oracle_apply


def _random_arch(rng):
    tokens = [f"c{rng.choice([3, 5])}s1-{rng.choice([4, 8])}"]
    stride = 1
    for _ in range(rng.integers(1, 4)):
        kind = rng.choice(["d", "R", "C"])
        if kind == "d" and stride < 4:
            tokens.append(f"d{rng.choice([8, 16])}")
            stride *= 2
        elif kind == "R":
            tokens.append(f"R{int(tokens[-1].split('-')[-1]) if '-' in tokens[-1] else int(tokens[-1][1:])}")
        else:
            last = int(tokens[-1].split('-')[-1]) if '-' in tokens[-1] else int(tokens[-1][1:])
            tokens.append(f"C{last}")
    while stride > 1:
        if rng.random() < 0.5:
            tokens.append("U2")
        else:
            tokens.append(f"u{rng.choice([4, 8])}")
        stride //= 2
    tokens.append("c3s1-3")
    return ",".join(tokens)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_arch(seed):
    rng = np.random.default_rng(seed)
    padding = rng.choice(["zero", "reflect", "replicate", "reflect-start"])
    arch = _random_arch(rng)
    spec = arch_dsl.parse_arch(arch, in_channels=7, padding_type=str(padding))
    params = stylizer.init_params(jax.random.PRNGKey(seed), spec)
    size = 16 * spec.total_stride
    x = rng.normal(size=(1, size, size, 7)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        y = np.asarray(stylizer.apply(params, spec, jnp.asarray(x)))
    assert y.shape == (1, size, size, 3), (arch, padding)
    assert np.all(np.isfinite(y))
    want = oracle_apply(params, spec, x)
    np.testing.assert_allclose(y, want, atol=5e-3, err_msg=f"{arch} {padding}")
