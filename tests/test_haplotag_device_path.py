"""Device-windowed haplotag path parity with the sparse host path."""

import numpy as np
import pytest

from duet_tpu.models import snp_phaser as sp
from test_snp_phaser import diploid_matrix, matrix_from_dense


@pytest.mark.parametrize("seed,window,halo", [
    (0, 32, 8),    # many windows, reads span window edges -> halo exercised
    (1, 2048, 256),  # one window
])
def test_windowed_device_matches_host(seed, window, halo):
    rng = np.random.default_rng(seed)
    D, haps = diploid_matrix(rng, n_reads=150, n_sites=90, span=12, err=0.05)
    am = matrix_from_dense(D)
    phase, block_id, block_ps = sp._initial_phase(am)
    phase = sp._power_refine(am, phase, block_id, sweeps=2)

    host = sp._haplotag(am, phase, block_id, block_ps)
    dev = sp._haplotag_device(am, phase, block_id, block_ps,
                              window=window, halo=halo)
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
