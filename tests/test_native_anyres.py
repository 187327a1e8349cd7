"""Native (C++) anyres tile extractor: parity vs the PIL golden path + speed."""

import os
import time

import numpy as np
import pytest

from radvlm_tpu import native
from radvlm_tpu.config import AnyResConfig
from radvlm_tpu.models.anyres import select_best_resolution
from radvlm_tpu.ops.image_ops import device_plan, preprocess_anyres_host

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native extension"
)


def test_resize_parity_with_pil(rng):
    from PIL import Image

    img = rng.integers(0, 255, size=(523, 461, 3), dtype=np.uint8)
    ours = native.resize_rgb(img, 384, 384)
    ref = np.asarray(Image.fromarray(img).resize((384, 384), Image.BICUBIC))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # Same Keys kernel + antialias; implementations differ in fixed-point
    # rounding, so allow a couple of gray levels on a tiny fraction of pixels.
    assert np.mean(diff) < 0.5
    assert np.percentile(diff, 99.9) <= 3


def test_anyres_tiles_parity(rng):
    cfg = AnyResConfig()
    img = rng.integers(0, 255, size=(700, 520, 3), dtype=np.uint8)
    ref_tiles, size = preprocess_anyres_host(img, cfg)

    plan = device_plan((img.shape[1], img.shape[0]), cfg)
    ours = native.anyres_tiles(
        img, cfg.tile_size,
        (plan["best_w"], plan["best_h"]),
        (plan["new_w"], plan["new_h"]),
    )
    assert ours.shape == ref_tiles.shape
    diff = np.abs(ours.astype(int) - ref_tiles.astype(int))
    assert np.mean(diff) < 0.6
    assert np.percentile(diff, 99.5) <= 3


def test_env_switch_roundtrip(rng):
    cfg = AnyResConfig()
    img = rng.integers(0, 255, size=(600, 480, 3), dtype=np.uint8)
    os.environ["RADVLM_NATIVE_ANYRES"] = "1"
    try:
        t_native, _ = preprocess_anyres_host(img, cfg)
    finally:
        del os.environ["RADVLM_NATIVE_ANYRES"]
    t_pil, _ = preprocess_anyres_host(img, cfg)
    assert t_native.shape == t_pil.shape
    assert t_native.dtype == np.uint8
    assert np.mean(np.abs(t_native.astype(int) - t_pil.astype(int))) < 0.6


def test_native_speed(rng):
    cfg = AnyResConfig()
    imgs = [rng.integers(0, 255, size=(520, 460, 3), dtype=np.uint8)
            for _ in range(4)]
    plan = device_plan((460, 520), cfg)

    t0 = time.perf_counter()
    for img in imgs:
        native.anyres_tiles(
            img, cfg.tile_size, (plan["best_w"], plan["best_h"]),
            (plan["new_w"], plan["new_h"]),
        )
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for img in imgs:
        preprocess_anyres_host(img, cfg)
    t_pil = time.perf_counter() - t0
    print(f"native {t_native*250:.1f}ms/img vs PIL {t_pil*250:.1f}ms/img")
    # Not asserting a ratio (CI variance); just require it's not pathological.
    assert t_native < t_pil * 3
