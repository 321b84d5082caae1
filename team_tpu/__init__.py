"""TEAM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
ericzhengz/TEAM-Temporal-Evolution-Aware-Multimodal-model.

TEAM is a temporal-evolution-aware multimodal class-incremental continual-learning
stack: a frozen CLIP ViT-B/16 backbone feeds three learner families (zero-shot CLIP,
SimpleCIL prototype classifiers, and the flagship PROOF/TEAM learner with tri-modal
projections, cross-modal attention fusion, a UniCL contrastive loss, a temporal
graph-convolution network evolving per-(class, insect-state) prototypes, and an
adaptive state-distance matrix).

This package is a ground-up TPU-first redesign, not a port:

* Incremental growth (per-task projections / prompts / prototypes, reference
  ``utils/inc_net.py:371-434``) is preallocated into fixed-shape banks with active
  masks so a single jitted train step serves every task without retracing.
* Per-sample / per-edge Python loops in the UniCL loss (``models/proof.py:125-167``)
  and the temporal GCN (``models/dynamic_modal_graph.py:294-337``) become dense
  masked batched algebra on the MXU.
* The CLIP towers run through a Pallas flash-attention kernel (XLA fallback) and
  scale over a ``jax.sharding.Mesh`` with an all-gather global-batch CLIP loss (the
  working equivalent of the reference's broken ``gather_features`` path,
  ``utils/toolkit.py:111-126``).
"""

__version__ = "0.1.0"

from team_tpu.config import Config, load_config  # noqa: F401
