"""TPU check + microbench: fused Pallas photometric chain vs XLA chain."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sm3x.ops import augment as A
from sm3x.ops.augment_pallas import photometric_pallas, build_params

MEAN = (0.7833, 0.6712, 0.6026)
STD = (0.2139, 0.2472, 0.2571)


def main(b=256, h=224, w=224, iters=30):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    params = build_params(jax.random.key(0), b, A.SSL_AUG)

    # correctness on device vs interpret-mode oracle (small slice)
    small_i, small_p = images[:8], params[:8]
    want = np.asarray(photometric_pallas(small_i, small_p, MEAN, STD,
                                         interpret=True))
    got = np.asarray(photometric_pallas(small_i, small_p, MEAN, STD))
    err = np.max(np.abs(got - want))
    print(f"device vs interpret max abs err: {err:.2e}")
    assert err < 1e-3, "device kernel mismatch"

    fused = jax.jit(lambda im, p: photometric_pallas(im, p, MEAN, STD))

    @jax.jit
    def xla_chain(rng_, x):
        b_ = x.shape[0]
        k_jit, k_jp, k_gp, k_fp, k_bp, k_bs = jax.random.split(rng_, 6)
        cfg = A.SSL_AUG
        do = jax.random.uniform(k_jp, (b_, 1, 1, 1)) < cfg.jitter_p
        x = jnp.where(do, A._batch_color_jitter(k_jit, x, cfg), x)
        do = jax.random.uniform(k_gp, (b_, 1, 1, 1)) < cfg.grayscale_p
        gray = jnp.sum(x * A._GRAY_W, axis=-1, keepdims=True)
        x = jnp.where(do, jnp.broadcast_to(gray, x.shape), x)
        do = jax.random.uniform(k_fp, (b_, 1, 1, 1)) < cfg.flip_p
        x = jnp.where(do, x[:, :, ::-1, :], x)
        do = jax.random.uniform(k_bp, (b_, 1, 1, 1)) < cfg.blur_p
        sigma = jax.random.uniform(k_bs, (b_, 1), minval=cfg.blur_sigma[0],
                                   maxval=cfg.blur_sigma[1])
        x = jnp.where(do, A._batch_gaussian_blur3(x, sigma), x)
        return A.normalize_images(x, MEAN, STD)

    def timeit(f, *args):
        """On-device repeat inside ONE jit dispatch (tunnel-RTT-free):
        scan over `iters` applications, fold the output back in so XLA
        can't elide the loop body."""
        @jax.jit
        def rep(*a):
            def body(x, _):
                out = f(*a[:-1], x)
                return out, ()
            y, _ = jax.lax.scan(body, a[-1], None, length=iters)
            return y

        out = rep(*args)
        np.asarray(out[0, 0, 0])  # force completion
        t0 = time.perf_counter()
        out = rep(*args)
        np.asarray(out[0, 0, 0])
        return (time.perf_counter() - t0) / iters

    t_pallas = timeit(lambda p, im: fused(im, p), params, images)
    t_xla = timeit(xla_chain, jax.random.key(1), images)
    print(f"batch {b}: pallas {t_pallas*1e3:.2f} ms ({b/t_pallas:.0f} img/s) | "
          f"xla {t_xla*1e3:.2f} ms ({b/t_xla:.0f} img/s) | "
          f"speedup {t_xla/t_pallas:.2f}x")


if __name__ == "__main__":
    main()
