"""stylemesh_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of the
StyleMesh capabilities (style transfer for indoor 3D scene reconstructions).

The reference implementation (lukasHoel/stylemesh, CVPR 2022) optimizes a
texture atlas so that renderings from captured viewpoints match a style image
(VGG Gram loss) while preserving photo content. This package rebuilds every
component TPU-first:

- ``ops``       low-level numerical ops (bilinear texture sampling with a
                custom scatter-add VJP, torch-semantics resizes, Gatys color
                transforms, masked Gram matrices, erosion).
- ``models``    VGG-16 feature extractor, texture-atlas pytrees, the
                content+style loss, and the jitted optimization pipeline.
- ``data``      ScanNet / Matterport scene ingestion, the per-pixel
                depth-level computation, packed on-host view caches and
                synthetic scenes for tests.
- ``geometry``  cameras, un/re-projection and a software UV/angle/depth
                rasterizer replacing the reference's C++/OpenGL preprocessors.
- ``parallel``  jax.sharding meshes: view-batch data parallelism with
                texture-gradient psum, multi-style sweeps.
- ``eval``      reprojection-consistency and circle-uniformity metrics.
- ``texturing`` texture masking and video assembly post-processing.
"""

__version__ = "0.1.0"
