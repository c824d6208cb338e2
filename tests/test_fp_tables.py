"""Fingerprint probe-table unit tests (build invariants + probe parity)."""
import unittest

import numpy as np

from pyctcdecode_tpu.models.device_tables import (
    _MAX_WINDOW,
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
        self.assertLessEqual(tab.max_probes, _MAX_WINDOW)
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

    def test_windows_pack_salted_bytes(self):
        """Packed window rows: salt byte + per-lane salted fp_lo bytes,
        with occupied lanes of every window pairwise byte-distinct."""
        from pyctcdecode_tpu.models.device_tables import _FP_EMPTY, _SALT_MIX

        rng = np.random.RandomState(7)
        keys = np.unique(rng.randint(0, 9999, size=(300, 2)), axis=0).astype(np.int32)
        tab = build_fp_table(
            keys, rng.randn(len(keys)).astype(np.float32),
            rng.randn(len(keys)).astype(np.float32),
        )
        self.assertEqual(tab.windows.shape, (tab.size, 2))
        w = tab.windows.view(np.uint32)
        salts = w[:, 0] & 0xFF
        cs = ((salts << np.uint32(1)) | np.uint32(1)) * np.uint32(_SALT_MIX)
        lane_bytes = np.stack(
            [
                (w[:, 0] >> 8) & 0xFF,
                (w[:, 0] >> 16) & 0xFF,
                w[:, 0] >> 24,
                w[:, 1] & 0xFF,
                (w[:, 1] >> 8) & 0xFF,
                (w[:, 1] >> 16) & 0xFF,
                w[:, 1] >> 24,
            ],
            axis=1,
        )
        for d in range(tab.max_probes):
            want = (tab.fp_lo[d : d + tab.size] * cs) >> np.uint32(24)
            np.testing.assert_array_equal(lane_bytes[:, d], want)
        for s in range(tab.size):
            occ = [
                int(lane_bytes[s, d])
                for d in range(tab.max_probes)
                if tab.fp_lo[s + d] != _FP_EMPTY
            ]
            self.assertEqual(len(occ), len(set(occ)), f"window {s}")
        np.testing.assert_array_equal(
            tab.slots[:, 2].view(np.float32), tab.prob
        )
        np.testing.assert_array_equal(
            tab.slots[:, 1].view(np.uint32), tab.fp_hi
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
            "win": jnp.asarray(tab.windows),
            "slots": jnp.asarray(tab.slots),
            "seed_lo": jnp.uint32(tab.seed_lo),
            "seed_hi": jnp.uint32(tab.seed_hi),
            "max_probes": tab.max_probes,
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
