"""Pallas scoring kernel parity vs the jnp path (interpret mode on CPU;
the same assertions run compiled on TPU in bench/driver flows)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as g
from duet_tpu.ops.haplotag import phase_and_tag
from duet_tpu.ops.pallas_haplotag import haplotag_score_pallas

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("R,S,B", [(300, 256, 5), (256, 128, 1), (700, 512, 33)])
def test_pallas_matches_jnp(R, S, B):
    alleles, weights, phase0, onehot = g._example_batch(R=R, S=S, B=B, seed=R)
    ref = phase_and_tag(alleles, weights, phase0, onehot, sweeps=0)
    hap, pc, best = haplotag_score_pallas(alleles, weights, phase0, onehot,
                                          interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(hap), np.asarray(ref["hap"]))
    tagged = np.asarray(ref["hap"]) != 0
    np.testing.assert_array_equal(np.asarray(pc)[tagged],
                                  np.asarray(ref["pc"])[tagged])
    np.testing.assert_array_equal(np.asarray(best), np.asarray(ref["best_block"]))


@pytest.mark.parametrize("R,S,B,sweeps", [
    (300, 200, 5, 2), (1024, 512, 16, 2), (257, 129, 3, 3), (512, 256, 8, 0),
])
def test_fused_matches_jnp(R, S, B, sweeps):
    """The fully fused kernel (power sweeps + scoring, aw built in VMEM)
    must reproduce phase_and_tag bit-for-bit — every intermediate sum is an
    exactly representable integer, so accumulation order cannot drift."""
    import jax.numpy as jnp

    from duet_tpu.ops.pallas_haplotag import phase_and_tag_fused

    alleles, weights, phase0, onehot = g._example_batch(R=R, S=S, B=B, seed=R)
    ref = phase_and_tag(alleles, weights, phase0, onehot, sweeps=sweeps)
    fus = phase_and_tag_fused(
        jnp.asarray(alleles), jnp.asarray(weights, jnp.bfloat16),
        jnp.asarray(phase0), jnp.asarray(onehot),
        sweeps=sweeps, interpret=INTERPRET,
    )
    for key in ("hap", "pc", "best_block", "phase"):
        np.testing.assert_array_equal(np.asarray(ref[key]),
                                      np.asarray(fus[key]), err_msg=key)


def test_batch_pallas_matches_jnp_batch():
    """The batched Pallas launch (grid over stacked chunks) is bit-equal to
    the batched XLA twin on every packed column."""
    import ml_dtypes

    from duet_tpu.ops.haplotag import phase_and_tag_batch
    from duet_tpu.ops.pallas_haplotag import TILE_R, haplotag_score_batch_pallas

    T, S, B = 3, 256, 126
    rng = np.random.default_rng(5)
    A = np.zeros((T * TILE_R, S), np.int8)
    W = np.zeros((T * TILE_R, S), np.float32)
    rhs = np.zeros((T * S, 2 + B), np.float32)
    for k in range(T):
        a, w, ph, oh = g._example_batch(R=TILE_R, S=S, B=B, seed=10 + k)
        A[k * TILE_R:(k + 1) * TILE_R] = a
        W[k * TILE_R:(k + 1) * TILE_R] = w
        rhs[k * S:(k + 1) * S, 0] = ph
        rhs[k * S:(k + 1) * S, 1] = ph != 0
        rhs[k * S:(k + 1) * S, 2:] = oh
    W16 = W.astype(ml_dtypes.bfloat16)
    rhs16 = rhs.astype(ml_dtypes.bfloat16)
    hap_j, pc_j, best_j = phase_and_tag_batch(A, W16, rhs16, n_tasks=T,
                                              n_blocks=B)
    packed = np.asarray(haplotag_score_batch_pallas(
        A, W16, rhs16, n_tasks=T, n_blocks=B, interpret=INTERPRET))
    np.testing.assert_array_equal(packed[:, 0], np.asarray(hap_j))
    tagged = np.asarray(hap_j) != 0
    np.testing.assert_array_equal(packed[tagged, 1], np.asarray(pc_j)[tagged])
    np.testing.assert_array_equal(packed[tagged, 2],
                                  np.asarray(best_j)[tagged])


def test_fused_rejects_f32_weights():
    from duet_tpu.ops.pallas_haplotag import phase_and_tag_fused

    alleles, weights, phase0, onehot = g._example_batch(R=64, S=128, B=2, seed=0)
    with pytest.raises(TypeError):
        phase_and_tag_fused(alleles, weights, phase0, onehot,
                            interpret=INTERPRET)
