"""Neural fields (Flax): NeRF MLPs, articulated variants, codes, encoders."""

from aonerf.models.mlp import NeRFMLP  # noqa: F401
from aonerf.models.nerf import NeRF  # noqa: F401
from aonerf.models.articulated import ArticulatedNeRFMLP, ArticulatedNeRF  # noqa: F401
from aonerf.models.codes import CodeLibraryArticulated  # noqa: F401
from aonerf.models.joint_state import JointStateDecoder  # noqa: F401
