"""Archived Pallas merge kernel: direct kernel parity (interpret mode).

The fused expand+merge Pallas kernel was retired from the decode surface
in round 4 after measuring 31x SLOWER than XLA's reductions at the
serving shape (batch 384, K 6, B 100: 2.02 ms/frame vs 0.065 —
scripts/bench_merge_kernel.py; PARITY.md records the sweep). The kernel
itself is kept as an archived experiment; these tests pin it against
``engine._merge_dense`` so the archive stays correct.
"""
import os
import unittest

import numpy as np


class TestMergeKernelParity(unittest.TestCase):
    """merge_score_pallas == _merge_dense + window prune on fuzz inputs."""

    def _compare(self, k, b, seed, kchunk=None):
        import jax.numpy as jnp

        from pyctcdecode_tpu.engine import DEAD, _merge_dense
        from pyctcdecode_tpu.ops import pallas_merge as pm

        rng = np.random.RandomState(seed)
        kl = rng.randint(0, 5, size=(k, b)).astype(np.uint32)
        kh = kl * np.uint32(2654435761)
        valid = rng.rand(k, b) < 0.7
        logit = np.where(valid, rng.randn(k, b), DEAD).astype(np.float32)
        extra = rng.randn(k, b).astype(np.float32)
        args = (
            jnp.asarray(kl), jnp.asarray(kh),
            jnp.asarray(valid.astype(np.int32)),
            jnp.asarray(logit), jnp.asarray(extra), jnp.float32(-10.0),
        )
        old = os.environ.get("PYCTCDECODE_TPU_MERGE_KCHUNK")
        try:
            if kchunk is not None:
                os.environ["PYCTCDECODE_TPU_MERGE_KCHUNK"] = str(kchunk)
                self.assertEqual(pm._k_chunk(k, b), kchunk)
            s_c, m_c, src_c = pm.merge_score_pallas(*args, interpret=True)
        finally:
            if old is None:
                os.environ.pop("PYCTCDECODE_TPU_MERGE_KCHUNK", None)
            else:
                os.environ["PYCTCDECODE_TPU_MERGE_KCHUNK"] = old
        merged, dup, donor = _merge_dense(
            jnp, (args[0], args[1]), jnp.asarray(valid), args[3]
        )
        rep = jnp.asarray(valid) & ~dup
        score = jnp.where(rep, merged + args[4], DEAD)
        score = jnp.where(score >= jnp.max(score) - 10.0, score, DEAD)
        np.testing.assert_allclose(np.asarray(s_c), np.asarray(score), atol=1e-5)
        src_want = jnp.arange(k, dtype=jnp.int32)[:, None] * b + donor
        live = np.asarray(score) > -1e29
        np.testing.assert_array_equal(
            np.asarray(src_c)[live], np.asarray(src_want)[live]
        )

    def test_parity_small(self):
        self._compare(6, 16, seed=3)

    def test_parity_wider(self):
        self._compare(8, 32, seed=5)

    def test_forced_chunk_matches(self):
        self._compare(12, 32, seed=7, kchunk=4)

    def test_vmem_guard(self):
        """Guard fires only when even single-column chunks exceed VMEM."""
        import jax.numpy as jnp

        from pyctcdecode_tpu.ops.pallas_merge import _k_chunk, merge_score_pallas

        # large K alone is fine: the sweep chunks token columns
        self.assertEqual(_k_chunk(600, 100), 50)
        # but B*B itself past VMEM cannot be chunked (kc floors at 1)
        big = jnp.zeros((4, 2000), dtype=jnp.uint32)
        with self.assertRaisesRegex(ValueError, "merge kernel"):
            merge_score_pallas(
                big, big, big != 0, big.astype(jnp.float32),
                big.astype(jnp.float32), jnp.float32(-10.0),
                interpret=True,
            )


if __name__ == "__main__":
    unittest.main()
