"""biomedkg_tpu — a TPU-native biomedical knowledge-graph learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of HySonLab/BioMedKG
(reference mounted read-only at /root/reference): three-stage multimodal
biomedical KG link prediction on PrimeKG++ / DrugBank DTI —

  Stage A: language-model modality embeddings per node attribute
  Stage B: graph contrastive learning (DGI / GRACE / GGD) per node type
  Stage C: knowledge-graph embedding (RGCN/RGAT encoder + TransE/DistMult/
           ComplEx/RotatE decoder) trained for link prediction, with DPI
           fine-tuning and downstream gradient-boosted-tree evaluation.

Design is TPU-first, not a port: static-shape padded subgraph batches,
relation-sorted edge blocks feeding a Pallas blocked matmul on the MXU,
on-device negative sampling fused into the scoring kernel, jit-compiled
train steps, data-parallel + tensor-parallel sharding over a jax Mesh,
orbax checkpoints and pure-JAX psum-reducible metrics.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: remote TPU compiles take minutes; cache
# hits make reruns of identical programs instant.
if not _os.environ.get("BIOMEDKG_NO_COMPILE_CACHE"):
    import jax as _jax_cc

    _cache_dir = _os.environ.get(
        "BIOMEDKG_COMPILE_CACHE",
        _os.path.expanduser("~/.cache/biomedkg_jax_cache"))
    try:
        _jax_cc.config.update("jax_compilation_cache_dir", _cache_dir)
        # 10s threshold: caches the minutes-long remote TPU compiles while
        # skipping small CPU programs (their AOT results carry machine
        # feature strings that can mismatch across runs → SIGILL risk).
        _jax_cc.config.update("jax_persistent_cache_min_compile_time_secs",
                              10.0)
    except Exception:
        pass

if _os.environ.get("BIOMEDKG_PLATFORM"):
    # Test/CI hook: the axon TPU plugin pre-seeds jax_platforms via
    # sitecustomize, ignoring JAX_PLATFORMS; override explicitly.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["BIOMEDKG_PLATFORM"])
