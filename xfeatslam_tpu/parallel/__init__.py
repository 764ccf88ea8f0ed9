"""Multi-chip parallelism: device meshes, sharded batched pipelines, and the
distributed XFeat training step.

The reference has no distributed anything (SURVEY.md §2.3.6: threads + one
optional CUDA stream). These are the TPU-native parallel capabilities that
take its roles at scale: data-parallel batched frame processing over ICI,
tensor-parallel descriptor matching, and a sharded training step for
(re)learning XFeat weights in-framework.
"""
