"""Optional W&B metrics callback (reference `report_to wandb`,
`finetune_radio_7b.sh:83`). Gated import: absent wandb degrades to a no-op with
a one-time warning, so the training driver's `metrics_callback` hook can always
be wired to this.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

log = logging.getLogger(__name__)


def make_wandb_callback(
    project: str = "radvlm-tpu",
    run_name: Optional[str] = None,
    config: Optional[Dict] = None,
):
    """Returns metrics_callback(step, metrics) for `training.loop.train`."""
    try:
        import wandb
    except ImportError:
        log.warning("wandb not installed; metrics logging is a no-op")
        return lambda step, metrics: None

    run = wandb.init(project=project, name=run_name, config=config or {})

    def callback(step: int, metrics: Dict[str, float]):
        run.log(metrics, step=step)

    return callback
