"""ALIKE with real bundled pretrained weights: functional matching test."""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp

ALIKE_WEIGHTS = Path(
    "/root/reference/src/deep_image_matching/thirdparty/alike/models/alike-t.pth"
)


@pytest.mark.skipif(not ALIKE_WEIGHTS.exists(), reason="bundled weights absent")
def test_alike_pretrained_functional(image_dir):
    import cv2

    from deep_image_matching_tpu.models import alike as am
    from deep_image_matching_tpu.ops.nn_match import nn_match

    sd = torch.load(str(ALIKE_WEIGHTS), map_location="cpu")
    params = am.params_from_torch(sd, "alike-t")

    img = cv2.imread(str(sorted(image_dir.iterdir())[0]))
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    img = cv2.resize(img, (512, 384))
    shift = 64
    a, b = img[:, :-shift], img[:, shift:]

    batch = np.stack([a, b])
    vhw = np.array([[384, 448]] * 2, np.int32)
    out = am.extract(
        params, jnp.asarray(batch), jnp.asarray(vhw),
        max_keypoints=512, scores_th=0.2, nms_radius=2,
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    assert out["mask"][0].sum() > 50

    matches0, valid = nn_match(
        jnp.asarray(out["descriptors"][0]), jnp.asarray(out["descriptors"][1]),
        jnp.asarray(out["mask"][0]), jnp.asarray(out["mask"][1]),
        mode="smnn", ratio_th=0.95,
    )
    matches0, valid = np.asarray(matches0), np.asarray(valid)
    rows = np.nonzero(valid)[0]
    assert len(rows) > 30
    k0 = out["keypoints"][0][rows]
    k1 = out["keypoints"][1][matches0[rows]]
    assert abs(np.median(k0[:, 0] - k1[:, 0]) - shift) < 1.5
    assert abs(np.median(k0[:, 1] - k1[:, 1])) < 1.5
