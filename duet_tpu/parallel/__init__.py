from duet_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    phase_and_tag_sharded,
)
