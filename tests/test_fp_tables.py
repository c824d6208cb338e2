"""Fingerprint probe-table unit tests (build invariants + probe parity)."""
import unittest

import numpy as np

from pyctcdecode_tpu.models.device_tables import (
    build_fp_table,
    probe_fp_host,
)


class TestFPTable(unittest.TestCase):
    def test_all_inserted_keys_resolve_exactly(self):
        rng = np.random.RandomState(5)
        keys = np.unique(rng.randint(0, 50_000, size=(20_000, 3)), axis=0).astype(
            np.int32
        )
        probs = rng.randn(len(keys)).astype(np.float32)
        backoffs = rng.randn(len(keys)).astype(np.float32)
        tab = build_fp_table(keys, probs, backoffs)
        found, p, b = probe_fp_host(tab, keys)
        self.assertTrue(bool(found.all()))
        np.testing.assert_array_equal(p, probs)
        np.testing.assert_array_equal(b, backoffs)

    def test_absent_keys_miss(self):
        rng = np.random.RandomState(6)
        keys = rng.randint(0, 1000, size=(500, 2)).astype(np.int32)
        keys = np.unique(keys, axis=0)
        tab = build_fp_table(
            keys,
            np.ones(len(keys), np.float32),
            np.zeros(len(keys), np.float32),
        )
        absent = rng.randint(2000, 4000, size=(1000, 2)).astype(np.int32)
        found, _, _ = probe_fp_host(tab, absent)
        self.assertFalse(bool(found.any()))

    def test_bucket_invariants(self):
        """Bucket plane: every key in its hash bucket, residents'
        fingerprints pairwise distinct, empty slots carry the sentinel."""
        from pyctcdecode_tpu.models.device_tables import (
            _BUCKET_SLOTS,
            _BUCKET_WIDTH,
            _FP_EMPTY,
            _SUB_WIDTH,
            _query_hashes,
        )

        def row_fps(row, occupied_only=False):
            """Fingerprint pairs of one bucket row, across sub-blocks."""
            out = []
            for base_col in range(0, _BUCKET_WIDTH, _SUB_WIDTH):
                for j in range(_BUCKET_SLOTS):
                    pair = (
                        int(row[base_col + j]),
                        int(row[base_col + _BUCKET_SLOTS + j]),
                    )
                    if not occupied_only or pair[0] != int(_FP_EMPTY):
                        out.append(pair)
            return out

        rng = np.random.RandomState(7)
        keys = np.unique(rng.randint(0, 9999, size=(300, 2)), axis=0).astype(np.int32)
        tab = build_fp_table(
            keys, rng.randn(len(keys)).astype(np.float32),
            rng.randn(len(keys)).astype(np.float32),
        )
        self.assertEqual(tab.bucket.shape, (tab.size, _BUCKET_WIDTH))
        b = tab.bucket.view(np.uint32)
        n_occ = sum(len(row_fps(b[r], occupied_only=True)) for r in range(tab.size))
        self.assertEqual(n_occ, len(keys))
        # residents of one bucket (both sub-blocks) are fingerprint-distinct
        for row in range(tab.size):
            fps = row_fps(b[row], occupied_only=True)
            self.assertEqual(len(fps), len(set(fps)))
        # each key's fingerprint is present in its own bucket
        h, lo, hi = _query_hashes(
            np,
            {
                "hash_mode": tab.hash_mode,
                "seed_lo": np.uint32(tab.seed_lo),
                "seed_hi": np.uint32(tab.seed_hi),
            },
            keys,
        )
        base = (h % np.uint32(tab.size)).astype(np.int64)
        for i in range(len(keys)):
            self.assertIn(
                (int(lo[i]), int(hi[i])), set(row_fps(b[base[i]]))
            )

    def test_device_probe_matches_host(self):
        import jax.numpy as jnp

        from pyctcdecode_tpu.models.device_tables import probe_fp_jnp

        rng = np.random.RandomState(8)
        keys = np.unique(rng.randint(0, 5000, size=(2000, 3)), axis=0).astype(
            np.int32
        )
        tab = build_fp_table(
            keys, rng.randn(len(keys)).astype(np.float32),
            rng.randn(len(keys)).astype(np.float32),
        )
        queries = np.concatenate(
            [keys[:500], rng.randint(0, 9000, size=(500, 3)).astype(np.int32)]
        )
        hf, hp, hb = probe_fp_host(tab, queries)
        dev = {
            "bucket": jnp.asarray(tab.bucket),
            "seed_lo": jnp.uint32(tab.seed_lo),
            "seed_hi": jnp.uint32(tab.seed_hi),
            "size": tab.size,
        }
        df, dp, db = probe_fp_jnp(
            dev, jnp.asarray(queries), jnp.ones(len(queries), bool)
        )
        np.testing.assert_array_equal(np.asarray(df), hf)
        np.testing.assert_array_equal(np.asarray(dp), hp)
        np.testing.assert_array_equal(np.asarray(db), hb)

    def test_empty_table(self):
        tab = build_fp_table(
            np.zeros((0, 2), np.int32), np.zeros(0, np.float32),
            np.zeros(0, np.float32),
        )
        found, _, _ = probe_fp_host(tab, np.array([[1, 2]], np.int32))
        self.assertFalse(bool(found[0]))


if __name__ == "__main__":
    unittest.main()
