"""radvlm-tpu: TPU-native chest-X-ray VLM framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of rfahrn/RadVLM (see SURVEY.md):
data curation, LLaVA-OneVision-style modeling, sharded training, continuous-batched
inference/serving, and the full evaluation harness — designed TPU-first.
"""
import os

__version__ = "0.1.0"

# Mirrors the reference's DATA_DIR env contract (radvlm/__init__.py:5-7).
DATA_DIR = os.environ.get("DATA_DIR", None)
