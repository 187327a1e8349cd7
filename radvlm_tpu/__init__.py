"""radvlm_tpu: a TPU-native chest-X-ray VLM framework (JAX/XLA/Pallas/pjit).

Public API overview (see README.md for the full layout):

    from radvlm_tpu import config                      # model configs
    from radvlm_tpu.models import radvlm, hf_import    # model + checkpoints
    from radvlm_tpu.generation.engine import make_generate_fn
    from radvlm_tpu.generation.continuous import ContinuousBatcher
    from radvlm_tpu.training.loop import RunConfig, train
    from radvlm_tpu.eval.harness import VLMRunner, run_task
    from radvlm_tpu.eval import metrics
"""

__version__ = "0.1.0"

from radvlm_tpu.config import (  # noqa: F401
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    AnyResConfig,
    ProjectorConfig,
    Qwen2Config,
    RadVLMConfig,
    SigLIPConfig,
    radvlm_0_5b,
    radvlm_7b,
    tiny_test_config,
)
