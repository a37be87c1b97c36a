from deeparc_tpu.io.deeparc_format import DeepArcData, read_deeparc, write_deeparc
from deeparc_tpu.io.ply import write_ply
from deeparc_tpu.io.synthetic import make_hemisphere_rig, SyntheticRig
from deeparc_tpu.io.bal import read_bal

__all__ = [
    "DeepArcData",
    "read_deeparc",
    "write_deeparc",
    "write_ply",
    "make_hemisphere_rig",
    "SyntheticRig",
    "read_bal",
]
