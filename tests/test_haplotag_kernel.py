"""K1 device kernel parity: dense jitted path vs the sparse host path, and
mesh-sharded vs single-device execution (8 virtual CPU devices)."""

import numpy as np
import pytest

from duet_tpu.models import snp_phaser as sp
from duet_tpu.ops.haplotag import (
    block_onehot_from_ids,
    densify_window,
    phase_and_tag,
)


def synthetic_allele_matrix(rng, n_reads=64, n_sites=48, density=0.25):
    """Random COO AlleleMatrix with integer quality weights."""
    mask = rng.random((n_reads, n_sites)) < density
    row, col = np.nonzero(mask)
    return sp.AlleleMatrix(
        n_reads=n_reads,
        n_sites=n_sites,
        site_pos=np.arange(n_sites, dtype=np.int64) * 100 + 500,
        row=row.astype(np.int32),
        col=col.astype(np.int32),
        allele=rng.choice([-1, 1], size=len(row)).astype(np.int8),
        weight=rng.integers(10, 41, size=len(row)).astype(np.float32),
    )


@pytest.mark.parametrize("seed", range(6))
def test_dense_kernel_matches_sparse_host(seed):
    rng = np.random.default_rng(seed)
    am = synthetic_allele_matrix(rng)
    phase, block_id, block_ps = sp._initial_phase(am)
    phase_ref = sp._power_refine(am, phase.copy(), block_id, sweeps=2)
    hap_ref, ps_ref, pc_ref = sp._haplotag(am, phase_ref, block_id, block_ps)

    A, W = densify_window(am, 0, am.n_sites, np.arange(am.n_reads))
    onehot = block_onehot_from_ids(block_id, len(block_ps))
    out = phase_and_tag(A, W, phase.astype(np.float32), onehot, sweeps=2)

    np.testing.assert_array_equal(np.asarray(out["phase"]), phase_ref)
    np.testing.assert_array_equal(np.asarray(out["hap"]), hap_ref)
    tagged = hap_ref != 0
    np.testing.assert_array_equal(np.asarray(out["pc"])[tagged], pc_ref[tagged])


def test_sharded_matches_single_device():
    import jax

    from duet_tpu.parallel.mesh import make_mesh, pad_to_multiple, phase_and_tag_sharded

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(42)
    am = synthetic_allele_matrix(rng, n_reads=96, n_sites=64, density=0.3)
    phase, block_id, block_ps = sp._initial_phase(am)
    A, W = densify_window(am, 0, am.n_sites, np.arange(am.n_reads))
    onehot = block_onehot_from_ids(block_id, max(len(block_ps), 1))

    single = phase_and_tag(A, W, phase.astype(np.float32), onehot, sweeps=2)

    mesh = make_mesh(dp=4, sp=2)
    A8 = pad_to_multiple(pad_to_multiple(A, 4, 0), 2, 1)
    W8 = pad_to_multiple(pad_to_multiple(W, 4, 0), 2, 1)
    ph8 = pad_to_multiple(phase.astype(np.float32), 2, 0)
    oh8 = pad_to_multiple(onehot, 2, 0)
    hap, pc, best_block, phase_out = phase_and_tag_sharded(
        mesh, A8, W8, ph8, oh8, sweeps=2
    )
    R = am.n_reads
    np.testing.assert_array_equal(np.asarray(hap)[:R], np.asarray(single["hap"]))
    tagged = np.asarray(single["hap"]) != 0
    np.testing.assert_array_equal(
        np.asarray(pc)[:R][tagged], np.asarray(single["pc"])[tagged]
    )
    np.testing.assert_array_equal(
        np.asarray(phase_out)[: am.n_sites], np.asarray(single["phase"])
    )


def test_entry_and_dryrun():
    """The driver contract: entry() jits; dryrun_multichip(8) executes."""
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.asarray(out["hap"]).shape == (args[0].shape[0],)
    if len(jax.devices()) >= 8:
        g.dryrun_multichip(8)
