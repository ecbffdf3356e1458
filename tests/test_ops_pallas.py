"""Pallas kernel semantics (interpret mode -- CPU-checkable)."""

import numpy as np
import jax.numpy as jnp

from pycusdr_tpu.ops.doppler_search import (
    doppler_energy_matmul,
    doppler_energy_pallas,
    make_shift_gather_indices,
)


def test_pallas_doppler_energy_matches_matmul():
    N, M, D = 2048, 8, 20
    rng = np.random.RandomState(0)
    P = np.abs(rng.randn(N)).astype(np.float32)
    QT = np.abs(rng.randn(N, M)).astype(np.float32)
    shifts = rng.randint(0, N, D).astype(np.int32)
    sidx = make_shift_gather_indices(N, shifts)

    a = np.asarray(doppler_energy_matmul(jnp.asarray(P), jnp.asarray(QT), jnp.asarray(sidx)))
    b = np.asarray(doppler_energy_pallas(jnp.asarray(P), jnp.asarray(QT),
                                         jnp.asarray(shifts), interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_pallas_doppler_energy_lane_edges():
    """Shifts hitting q=0, lane 0/127 boundaries and the wrap point."""
    N, M = 1024, 4
    rng = np.random.RandomState(1)
    P = np.abs(rng.randn(N)).astype(np.float32)
    QT = np.abs(rng.randn(N, M)).astype(np.float32)
    shifts = np.array([0, 1, 127, 128, 129, N - 1, N - 128, 500], np.int32)
    sidx = make_shift_gather_indices(N, shifts)

    a = np.asarray(doppler_energy_matmul(jnp.asarray(P), jnp.asarray(QT), jnp.asarray(sidx)))
    b = np.asarray(doppler_energy_pallas(jnp.asarray(P), jnp.asarray(QT),
                                         jnp.asarray(shifts), rows_per_step=4,
                                         interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-6)
