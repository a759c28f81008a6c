"""Build a synthetic "room" scene in ScanNet layout for end-to-end demo runs.

Thin CLI over :mod:`stylemesh_tpu.data.demo_scene` (the builder lives in the
package so the quality-gate tests can parameterize it).

Usage: python tools/make_demo_scene.py <out_root> [n_views]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stylemesh_tpu.data.demo_scene import (  # noqa: F401 (back-compat)
    build_demo_scene,
    demo_texture,
    room_mesh,
)


def main(out_root, n_views=24, pyramid_heights=None):
    return build_demo_scene(out_root, n_views=n_views,
                            pyramid_heights=pyramid_heights)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo_room",
         int(sys.argv[2]) if len(sys.argv) > 2 else 24)
