"""Native MT19937 spawner vs CPython's random module: bit-exact contract."""

import random

import numpy as np
import pytest

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.oracle import MersenneSpawner

native = pytest.importorskip("acas2d_tpu.native")

P = DEFAULT_PARAMS


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("g++ unavailable / native build failed")
    return lib


def test_core_stream_matches_cpython(lib):
    h = lib.mt_new(13)
    py = random.Random(13)
    for _ in range(1000):
        assert lib.mt_random(h) == py.random()
    for _ in range(1000):
        assert lib.mt_uniform(h, -3.0, 3.0) == py.uniform(-3, 3)
    for bounds in [(0, 1), (1, 1), (0, 7), (5, 100)]:
        for _ in range(500):
            assert lib.mt_randint(h, *bounds) == py.randint(*bounds)
    lib.mt_free(h)


def test_spawn_batch_matches_python_spawner(lib):
    for skip in (0, 2):
        ns = native.NativeMersenneSpawner(P, skip_episodes=skip)
        ps = MersenneSpawner(P, skip_episodes=skip)
        nt, psi, tx, ty, tv, tpsi = ns.spawn_arrays(500)
        for i in range(500):
            ref = ps.spawn()
            assert nt[i] == ref.num_traffic
            assert psi[i] == ref.player_psi, i
            np.testing.assert_array_equal(tx[i], ref.traffic_x)
            np.testing.assert_array_equal(ty[i], ref.traffic_y)
            np.testing.assert_array_equal(tv[i], ref.traffic_v)
            np.testing.assert_array_equal(tpsi[i], ref.traffic_psi)


def test_spawn_batch_continuation(lib):
    """Consecutive spawn_arrays calls continue the same stream."""
    ns = native.NativeMersenneSpawner(P)
    a = ns.spawn_arrays(10)
    b = ns.spawn_arrays(10)
    ns2 = native.NativeMersenneSpawner(P)
    c = ns2.spawn_arrays(20)
    np.testing.assert_array_equal(np.concatenate([a[1], b[1]]), c[1])
