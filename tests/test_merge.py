"""Multi-sample merge of phased callsets."""

from duet_tpu.tools.merge import main as merge_main


def _write(path, rows):
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tVALUE\n")
        for chrom, pos, svtype, svlen, hp, ps in rows:
            f.write(f"{chrom}\t{pos}\tx\tN\t<{svtype}>\t.\tPASS\t"
                    f"SVLEN={svlen};SVTYPE=<{svtype}>\tHP:PS\t{hp}:{ps}\n")


def test_merge_trio(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    c = tmp_path / "c.vcf"
    _write(a, [("chr1", 1000, "DEL", -200, "1|0", "500"),
               ("chr1", 9000, "INS", 150, "1|1", "500")])
    _write(b, [("chr1", 1050, "DEL", -190, "0|1", "700")])   # matches a's DEL
    _write(c, [("chr1", 5000, "DEL", -300, "1|0", "900")])   # its own call
    out = tmp_path / "trio.vcf"
    merge_main([str(a), str(b), str(c), "-o", str(out),
                "--names", "HG002", "HG003", "HG004"])
    lines = [l for l in open(out) if not l.startswith("#")]
    assert len(lines) == 3
    by_pos = {int(l.split("\t")[1]): l.split("\t") for l in lines}
    merged = by_pos[1000]
    assert "NS=2" in merged[7]
    assert merged[9].startswith("1|0") and merged[10].startswith("0|1")
    assert merged[11].startswith("./.")
    assert by_pos[5000][11].startswith("1|0")
    assert "NS=1" in by_pos[9000][7]


def test_merge_respects_refdist(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    _write(a, [("chr1", 1000, "DEL", -200, "1|0", "1")])
    _write(b, [("chr1", 2500, "DEL", -200, "1|0", "1")])  # 1500 > refdist
    out = tmp_path / "m.vcf"
    merge_main([str(a), str(b), "-o", str(out)])
    lines = [l for l in open(out) if not l.startswith("#")]
    assert len(lines) == 2


def test_cluster_distance_sweep(sim_dataset, tmp_path):
    """-c sweep over the span-position linkage: one ingest, N clustering
    passes, per-point VCF + scored summary (BASELINE config 2 path)."""
    from duet_tpu.tools.sweep import run_sweep

    out, cfg, truth = sim_dataset
    summary = run_sweep(f"{out}/reads.bam", f"{out}/ref.fa", str(tmp_path),
                        values=[0.2, 0.9], truth=f"{out}/truth.vcf")
    assert summary["values"] == [0.2, 0.9]
    assert all(n > 0 for n in summary["n_calls"])
    assert all(0.0 <= f <= 1.0 for f in summary["calling_f1"])
    import os
    assert all(os.path.exists(v) for v in summary["vcfs"])
