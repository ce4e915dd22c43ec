"""Test-suite shim: the synthetic scene generators were promoted into the
package (`cvnerf_tpu.data.synthetic`, CLI `cvnerf-demo-data`) so users can
generate runnable demo data without the unbundled lego/fern captures. Tests
keep importing from here; the implementations live in the package."""

from cvnerf_tpu.data.synthetic import (  # noqa: F401
    make_blender_dataset,
    make_llff_dataset,
    make_llff_360_dataset,
    render_plane_scene,
    render_sphere_scene,
)
