"""Device-windowed haplotag path parity with the sparse host path."""

import numpy as np
import pytest

from duet_tpu.models import snp_phaser as sp
from test_snp_phaser import diploid_matrix, matrix_from_dense


@pytest.mark.parametrize("seed,window,halo,batch", [
    (0, 32, 8, 16),   # many windows, reads span window edges -> halo exercised
    (1, 2048, 256, 16),  # one window
    (2, 32, 8, 2),    # batch smaller than the task count -> multiple launches
    (3, 64, 16, 1),   # degenerate batch: one chunk per call
])
def test_windowed_device_matches_host(seed, window, halo, batch):
    rng = np.random.default_rng(seed)
    D, haps = diploid_matrix(rng, n_reads=150, n_sites=90, span=12, err=0.05)
    am = matrix_from_dense(D)
    phase, block_id, block_ps = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, sweeps=2)

    host = sp._haplotag(am, phase, block_id, block_ps)
    dev = sp._haplotag_device(am, phase, block_id, block_ps,
                              window=window, halo=halo, batch=batch)
    for h, d, name in zip(host, dev, ("hap", "ps", "pc")):
        np.testing.assert_array_equal(d, h, err_msg=name)


def test_batched_dispatch_call_count():
    """The whole contig's chunks ride a bounded number of device calls:
    ceil(chunks / batch), not one call per chunk (VERDICT r2 #4)."""
    from duet_tpu.utils import dispatch

    rng = np.random.default_rng(11)
    D, _ = diploid_matrix(rng, n_reads=900, n_sites=120, span=10, err=0.05)
    am = matrix_from_dense(D)
    phase, block_id, block_ps = sp._initial_phase(am)
    dispatch.reset()
    sp._haplotag_device(am, phase, block_id, block_ps, window=16, halo=4,
                        batch=16)
    calls = dispatch.snapshot().get("haplotag", {}).get("device", 0)
    # 900 reads over ~8 windows -> >= 8 chunks, but batched into one launch
    assert calls == 1


def test_overfull_window_falls_back_to_host():
    """A window with more phase-set blocks than the fixed kernel block axis
    routes its reads to the host path — outputs stay equal either way."""
    n_pairs = sp.HAPLOTAG_B + 10
    rows, cols, alleles, weights = [], [], [], []
    for i in range(n_pairs):  # read i covers only sites (2i, 2i+1)
        rows += [i, i]
        cols += [2 * i, 2 * i + 1]
        alleles += [1, -1]
        weights += [30.0, 30.0]
    from duet_tpu.models.snp_phaser import AlleleMatrix

    am = AlleleMatrix(
        n_reads=n_pairs, n_sites=2 * n_pairs,
        site_pos=np.arange(2 * n_pairs, dtype=np.int64) * 100,
        row=np.array(rows, np.int32), col=np.array(cols, np.int32),
        allele=np.array(alleles, np.int8),
        weight=np.array(weights, np.float32))
    phase, block_id, block_ps = sp._initial_phase(am)
    assert len(block_ps) > sp.HAPLOTAG_B
    host = sp._haplotag(am, phase, block_id, block_ps)
    dev = sp._haplotag_device(am, phase, block_id, block_ps,
                              window=4096, halo=256)
    for h, d, name in zip(host, dev, ("hap", "ps", "pc")):
        np.testing.assert_array_equal(d, h, err_msg=name)


def test_phase_contig_device_flag(sim_dataset):
    from duet_tpu.io.fasta import FastaFile
    from duet_tpu.io.readstore import load_read_store
    from duet_tpu.models.snp_caller import call_snps_for_store

    out, _, _ = sim_dataset
    store = load_read_store(f"{out}/reads.bam")
    fa = FastaFile(f"{out}/ref.fa")
    snps, _ = call_snps_for_store(store, {"chr21": fa.fetch_codes("chr21")})
    cr = store.contigs["chr21"]
    host = sp.phase_contig(cr, snps["chr21"], use_device=False)
    dev = sp.phase_contig(cr, snps["chr21"], use_device=True)
    np.testing.assert_array_equal(dev.read_hap, host.read_hap)
    np.testing.assert_array_equal(dev.read_ps, host.read_ps)
    np.testing.assert_array_equal(dev.read_pc, host.read_pc)


def test_sparse_power_refine_device_matches_host():
    from duet_tpu.ops.sparse_power import power_refine_device

    rng = np.random.default_rng(7)
    from test_snp_phaser import diploid_matrix, matrix_from_dense
    D, _ = diploid_matrix(rng, n_reads=200, n_sites=77, span=14, err=0.08)
    am = matrix_from_dense(D)
    phase0, block_id, _ = sp._initial_phase(am)
    host = sp._power_refine(am, phase0.copy(), block_id, sweeps=3)
    dev = power_refine_device(am, phase0.copy(), block_id, sweeps=3)
    np.testing.assert_array_equal(dev, host)
