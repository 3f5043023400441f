"""End-to-end byte parity against the REFERENCE'S OWN CODE.

Imports /root/reference/src/duet (sv_phasing_fn.py, write_file.py) directly
and runs its final stage — read_hap_bam -> generate_phased_callset ->
print_sv_header + print_sv — against the framework's run_phase_only on
IDENTICAL synthesized intermediates (sv_calling/variants.vcf + per-chrom
read->HP/PC/PS maps), asserting the two phased_sv.vcf files are
byte-identical, header included.

The only subprocess the reference stage makes with include_all_ctgs=False is
`samtools view` over the haplotagged BAMs (sv_phasing_fn.py:25); it is
monkeypatched with a fake that renders the same haplotag map as SAM text in
the positional HP/PC/PS tag layout the reference parses (sv_phasing_fn.py:
26-29).  Skips when the reference checkout is absent.
"""

import os
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_SRC, "duet", "sv_phasing_fn.py")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF_SRC)
    try:
        import duet.sv_phasing_fn as fn
        import duet.write_file as wf

        yield fn, wf
    finally:
        sys.path.remove(REF_SRC)


def synth_scenario(seed: int):
    """Random multi-chromosome callset + haplotag maps exercising every
    decision regime and the parser/emitter quirks (foreign PS, pc > 8100,
    untagged reads, sub-threshold svlen/support, './.' genotypes, and the
    lexicographic chr10-before-chr2 output order)."""
    rng = np.random.default_rng(seed)
    contigs = ["chr2", "chr10"] if seed % 2 else ["chr10", "chr2", "chrX"]
    read_hap = {c: {} for c in contigs}
    lines = []
    ridx = 0
    for contig in contigs:
        anchors = sorted(rng.choice(np.arange(1_000, 9_000_000), size=5,
                                    replace=False))
        n_calls = int(rng.integers(10, 30))
        positions = np.sort(rng.integers(1, 9_500_000, size=n_calls))
        for i in range(n_calls):
            names = []
            for _ in range(int(rng.integers(1, 12))):
                name = f"r{ridx}"
                ridx += 1
                names.append(name)
                kind = rng.random()
                if kind < 0.25:
                    continue  # untagged read
                hap = int(rng.integers(1, 3))
                if rng.random() < 0.75:
                    ps = int(rng.choice(anchors[:3]))
                else:
                    ps = int(rng.choice([77, 88, 99]))  # foreign phase set
                pc = int(rng.choice([0, 50, 777, 3000, 8100, 8101, 20000]))
                read_hap[contig][name] = (hap, ps, pc)
            svlen = int(rng.choice([30, 50, 80, 200, -60, -400, -1200]))
            svtype = "INS" if svlen > 0 else "DEL"
            support = int(rng.integers(1, 25))
            dr = int(rng.choice([0, 0, 1, 3, 8, 11, 15]))
            gt = str(rng.choice(["0/1", "1/1", "./.", "0/0"]))
            info = (f"SVLEN={svlen};SVTYPE={svtype};RE={support};"
                    f"RNAMES={','.join(names)}")
            lines.append(
                f"{contig}\t{int(positions[i])}\tcall.{contig}.{i}\tN\t"
                f"<{svtype}>\t.\tPASS\t{info}\tGT:DR:DV:PL:GQ\t"
                f"{gt}:{dr}:{support}:.,.,.:."
            )
    header = ["##fileformat=VCFv4.2", "##source=synthetic"] + [
        f"##contig=<ID={c},length=10000000>" for c in sorted(set(contigs))
    ] + ["#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSAMPLE"]
    return contigs, read_hap, "\n".join(header + lines) + "\n"


class _FakeSamtools:
    """Stand-in for the subprocess module inside the reference's modules:
    renders `samtools view <bam>` output from the haplotag map, with
    HP/PC/PS as the last three tags (the positional layout the reference
    parses, sv_phasing_fn.py:28-29), and answers `tabix --list-chroms`
    (read_file.py:15, the -a contig-list source) from a fixed list."""

    def __init__(self, read_hap_by_contig, chrom_list=None):
        self.maps = read_hap_by_contig
        self.chrom_list = chrom_list or []

    def check_output(self, argv):
        if argv[0] == "tabix":
            return ("".join(c + "\n" for c in self.chrom_list)).encode()
        path = argv[-1]
        stem = os.path.basename(path)[:-4]  # strip .bam
        m = self.maps.get(stem) or self.maps.get("chr" + stem) or {}
        out = []
        for name, (hap, ps, pc) in m.items():
            out.append(
                f"{name}\t0\t{stem}\t100\t60\t10M\t*\t0\t0\tACGT\tIIII\t"
                f"HP:i:{hap}\tPC:i:{pc}\tPS:i:{ps}\n"
            )
        return "".join(out).encode("ascii")


def run_reference(ref_modules, home: str, vcf_text: str, contigs, read_hap,
                  monkeypatch, all_ctgs: bool = False) -> str:
    fn, wf = ref_modules
    import duet.read_file as rf

    os.makedirs(os.path.join(home, "sv_calling"), exist_ok=True)
    ph = os.path.join(home, "snp_phasing")
    os.makedirs(ph, exist_ok=True)
    variants = os.path.join(home, "sv_calling", "variants.vcf")
    with open(variants, "w") as f:
        f.write(vcf_text)
    for c in contigs:  # read_hap_bam only opens BAMs that exist on disk
        open(os.path.join(ph, f"{c}.bam"), "wb").close()
    fake = _FakeSamtools(read_hap, chrom_list=list(contigs))
    monkeypatch.setattr(fn, "subprocess", fake)
    monkeypatch.setattr(rf, "subprocess", fake)  # -a: tabix --list-chroms
    out = os.path.join(home, "phased_sv.vcf")
    wf.print_sv_header(variants, out, all_ctgs)
    callset = fn.generate_phased_callset(variants, ph + "/", 50, 2, 1,
                                         all_ctgs)
    wf.print_sv(callset, out)
    return out


def run_framework(home: str, vcf_text: str, contigs, read_hap,
                  use_device: bool, all_ctgs: bool = False) -> str:
    from duet_tpu.pipeline import PipelineConfig, run_phase_only

    os.makedirs(os.path.join(home, "sv_calling"), exist_ok=True)
    ph = os.path.join(home, "snp_phasing")
    os.makedirs(ph, exist_ok=True)
    with open(os.path.join(home, "sv_calling", "variants.vcf"), "w") as f:
        f.write(vcf_text)
    for c in contigs:
        with open(os.path.join(ph, f"{c}.haplotags.tsv"), "w") as f:
            for name, (hap, ps, pc) in read_hap[c].items():
                f.write(f"{name}\t{hap}\t{ps}\t{pc}\n")
    if all_ctgs:
        # the -a contig list comes from the SNP-calling artifact (the
        # reference tabix-lists pileup.vcf.gz); synthesize one whose
        # data-line contig order matches the fake tabix's answer
        from duet_tpu.io.vcf import write_vcf

        os.makedirs(os.path.join(home, "snp_calling"), exist_ok=True)
        header = ["##fileformat=VCFv4.2",
                  "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]
        recs = [f"{c}\t100\t.\tA\tC\t.\tPASS\t.\tGT\t0/1" for c in contigs]
        write_vcf(os.path.join(home, "snp_calling", "pileup.vcf.gz"),
                  header, recs)
    cfg = PipelineConfig(bam="", reference="", output=home,
                         sv_min_size=50, min_support_read=2,
                         use_device_kernel=use_device,
                         include_all_ctgs=all_ctgs,
                         # force past the auto size gate so the device
                         # decision kernel is actually exercised here
                         device_stages="on" if use_device else "auto")
    return run_phase_only(cfg)


@pytest.mark.parametrize("seed", range(8))
def test_phase_only_bytes_match_reference(ref_modules, tmp_path, monkeypatch,
                                          seed):
    contigs, read_hap, vcf_text = synth_scenario(seed)
    ref_out = run_reference(ref_modules, str(tmp_path / "ref"), vcf_text,
                            contigs, read_hap, monkeypatch)
    got_out = run_framework(str(tmp_path / "got"), vcf_text, contigs,
                            read_hap, use_device=(seed % 2 == 0))
    with open(ref_out, "rb") as f:
        want = f.read()
    with open(got_out, "rb") as f:
        got = f.read()
    assert got == want
    # non-trivial scenario: the callset must actually contain phased records
    n_records = sum(1 for ln in want.decode().splitlines()
                    if ln and not ln.startswith("#"))
    if seed == 0:
        assert n_records > 0


@pytest.mark.parametrize("seed", range(4))
def test_phase_only_all_ctgs_matches_reference(ref_modules, tmp_path,
                                               monkeypatch, seed):
    """-a mode: the contig work list comes from the pileup artifact
    (reference read_file.py:13-15 tabix-lists snp_calling/pileup.vcf.gz);
    outputs must still be byte-identical, including non-standard contig
    names the fixed chr1-22/X/Y list would drop."""
    contigs, read_hap, vcf_text = synth_scenario(seed + 100)
    # rename one contig to a non-standard name both sides must keep
    alias = {contigs[0]: "chrUn_KI270742v1"}
    contigs = [alias.get(c, c) for c in contigs]
    read_hap = {alias.get(c, c): m for c, m in read_hap.items()}
    for old, new in alias.items():
        vcf_text = vcf_text.replace(old + "\t", new + "\t")
    ref_out = run_reference(ref_modules, str(tmp_path / "ref"), vcf_text,
                            contigs, read_hap, monkeypatch, all_ctgs=True)
    got_out = run_framework(str(tmp_path / "got"), vcf_text, contigs,
                            read_hap, use_device=False, all_ctgs=True)
    with open(ref_out, "rb") as f:
        want = f.read()
    with open(got_out, "rb") as f:
        got = f.read()
    assert got == want


def test_reference_parity_emits_calls(ref_modules, tmp_path, monkeypatch):
    """At least one seed must produce a populated callset overall (guards
    against a vacuous all-empty parity pass)."""
    total = 0
    for seed in range(8):
        contigs, read_hap, vcf_text = synth_scenario(seed)
        ref_out = run_reference(ref_modules, str(tmp_path / f"r{seed}"),
                                vcf_text, contigs, read_hap, monkeypatch)
        with open(ref_out) as f:
            total += sum(1 for ln in f if ln.strip() and not ln.startswith("#"))
    assert total > 20
