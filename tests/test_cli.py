"""CLI surface parity with the reference (src/duet/utils.py:19-44).

A reference user's exact invocation must parse unchanged: same three
positionals, same short flags, same defaults.  Framework extensions are
long-form only.
"""

import pytest

from duet_tpu.cli import build_parser


def test_reference_invocation_parses():
    # the reference README's documented call shape (README.md:50-63)
    args = build_parser().parse_args(
        "in.bam ref.fa outdir -t 8 -m 0.3 -c 0.8 -s 40 -r 3 -a -b svim".split()
    )
    assert (args.BAM, args.REFERENCE, args.OUTPUT) == ("in.bam", "ref.fa",
                                                       "outdir")
    assert args.threads == 8
    assert args.min_allele_frequency == 0.3
    assert args.cluster_max_distance == 0.8
    assert args.sv_min_size == 40
    assert args.min_support_read == 3
    assert args.include_all_ctgs is True
    assert args.sv_caller == "svim"


def test_reference_defaults():
    """Defaults match reference utils.py:23-36 flag for flag."""
    args = build_parser().parse_args(["a.bam", "r.fa", "o"])
    assert args.threads == 4
    assert args.min_allele_frequency == 0.25
    assert args.cluster_max_distance == 0.9
    assert args.sv_min_size == 50
    assert args.min_support_read == 2
    assert args.include_all_ctgs is False
    assert args.sv_caller == "cutesv"
    # framework extensions default off/auto
    assert args.resume is False and args.stream is False
    assert args.device_stages == "auto" and args.mesh is None


def test_module_entry_point():
    import subprocess
    import sys

    out = subprocess.run([sys.executable, "-m", "duet_tpu", "--help"],
                         capture_output=True, text=True)
    assert out.returncode == 0
    assert "phased_sv.vcf" in out.stdout


def test_bad_caller_rejected():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["a.bam", "r.fa", "o", "-b", "delly"])
