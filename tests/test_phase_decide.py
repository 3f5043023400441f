"""Device decision kernel (K3) parity vs the float64 host path."""

import numpy as np
import pytest

from duet_tpu.models import sv_phaser as svp
from duet_tpu.ops.phase_decide import phase_decide_packed

from test_sv_phaser import random_callset


@pytest.mark.parametrize("seed", range(12))
def test_device_kernel_matches_host(seed):
    rng = np.random.default_rng(1000 + seed)
    calls, records, read_hap = random_callset(rng, n_calls=60)
    svp.attach_read_haplotypes(records, read_hap)
    kept = [r for r in records
            if abs(r.svlen) >= 50 and r.support >= 2 and r.gt != "./."]
    if not kept:
        return
    packed = svp.pack_calls(kept)
    regime = svp.distinct_ps_regime(packed)
    oneps = svp.build_oneps_set(packed, np.ones(packed.n, bool), regime)
    if len(oneps) == 0:
        return
    feats = svp.compute_features(packed, regime, oneps)
    pred_host = svp.decide_haplotype(feats, regime)
    pred_dev, ps_dev = phase_decide_packed(packed, oneps)
    np.testing.assert_array_equal(pred_dev, pred_host)
    np.testing.assert_array_equal(ps_dev, feats.ps)


def test_threshold_edges_exact():
    """Pin the rational-threshold translations at exact boundary points."""
    from duet_tpu.io.vcf import SVRecord

    def mk(svread, refread, reads):
        rec = SVRecord(chrom="chr1", pos=1000, call_id="x", ref="N", alt="<DEL>",
                       qual=".", filt="PASS", info="", fmt="", sample="",
                       svlen=-100, svtype="DEL", support=svread,
                       read_names=[f"r{i}" for i in range(len(reads))],
                       gt="0/1", ref_reads=refread)
        rec.read_haps = reads
        return rec

    # sv_ratio == 0.72 boundary: 18/25 -> regime-2 rule fires (>=)
    cases = []
    # 18 sv / 7 ref = 0.72 exactly; two phase sets, avg diff 0 -> need sv_num>=3
    reads = [(1, 100, 50), (2, 100, 50), (1, 200, 50), (2, 200, 50)]
    cases.append((mk(18, 7, reads), 3))
    # 17.99.. below: 179 sv, 71 ref -> 179/250 = 0.716 < 0.72 -> no call
    cases.append((mk(179, 71, reads), 0))

    for rec, want in cases:
        packed = svp.pack_calls([rec])
        regime = svp.distinct_ps_regime(packed)
        # force anchors so both PS values qualify
        oneps = np.array([100, 200], dtype=np.int64)
        feats = svp.compute_features(packed, regime, oneps)
        host = svp.decide_haplotype(feats, regime)
        dev, _ = phase_decide_packed(packed, oneps)
        assert host[0] == dev[0] == want
