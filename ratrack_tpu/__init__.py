"""RaTrack-TPU: a TPU-native 4D-radar moving-object tracking framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of RaTrack
(LJacksonPan/RaTrack, ICRA 2024): PointNet++-MSG feature extraction,
cost-volume scene flow, motion segmentation, on-device DBSCAN clustering and
Sinkhorn track association — all compiled into a single XLA program per
frame step, with fixed shapes, validity masks, and `jax.sharding` data
parallelism over clips.

Layout
------
ops/       masked fixed-shape point-cloud ops (FPS, ball query, kNN, 3-NN
           interpolation) — TPU-native replacement for the reference's
           `pointnet2_cuda` extension (reference: src/lib/).
models/    Flax modules: PNHead backbone, FeatureCorrelator cost volume,
           FlowDecoder (+GRU), predictors, Affinity MLP, Track4D network.
tracker/   on-device DBSCAN, log-Sinkhorn optimal transport, slot-based
           track association and per-frame recurrent state.
data/      VoD dataset reader, GT assembly (OBB in-box tests, rigid GT
           flow), fixed-shape padding pipeline, synthetic data.
train/     losses, metrics, train/eval steps, driver loop, checkpointing.
eval/      result export, Kalman-filter MOT tracker, SAMOTA/AMOTA metrics.
parallel/  device mesh + sharding helpers.
"""

__version__ = "0.1.0"
