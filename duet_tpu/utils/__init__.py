from duet_tpu.utils.chrom import standard_chrom_names, resolve_contig_names
from duet_tpu.utils.logging import get_logger, setup_logging, stage_banner, StageTimer
