"""Pure rendering math ops (jnp, statically shaped, jit-friendly).

Semantics match the reference implementation exactly (fp32) so that rendered
pixels and pixel gradients are allclose; see each module's docstring for the
reference file:line it corresponds to.
"""

from aonerf.ops.encoding import pos_enc  # noqa: F401
from aonerf.ops.math import img2mse, mse2psnr  # noqa: F401
from aonerf.ops.rays import (  # noqa: F401
    get_ray_directions,
    get_rays,
    get_ndc_rays,
    create_spheric_poses,
)
from aonerf.ops.raybox import ray_box_intersection, get_ray_limits  # noqa: F401
from aonerf.ops.render import volumetric_rendering  # noqa: F401
from aonerf.ops.sampling import (  # noqa: F401
    cast_rays,
    sample_along_rays,
    sorted_piecewise_constant_pdf,
    sample_pdf,
)
