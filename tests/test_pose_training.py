"""Pose-workload training coverage: fg/part/face masks, remove_face_labels,
face discriminator, face refiner, and flow-teacher supervision in the step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fsvid2vid_tpu.config import pose_config
from fsvid2vid_tpu.models.input_process import (
    get_fg_mask, get_part_mask, get_face_mask, use_valid_labels,
    combine_fg_mask, encode_label)
from fsvid2vid_tpu.models.face_refiner import (
    get_face_boxes, crop_face_region, replace_face_region, face_size_of)
from fsvid2vid_tpu.training.state import build_models, init_state
from fsvid2vid_tpu.training.step import StepFlags, init_prevs, train_step

pytestmark = pytest.mark.slow  # >60s on one CPU (see pytest.ini)


def tiny_pose_cfg(**kw):
    base = dict(ngf=4, nff=4, ndf=4, fine_size=32, load_size=32,
                n_blocks_F=2, n_downsample_G=3, n_adaptive_layers=2,
                batch_size=2, no_vgg_loss=True, refine_face=True,
                compute_dtype="float32")
    base.update(kw)
    return pose_config(**base)


def pose_label(rng, b, h, w):
    """6-channel pose map with a plausible DensePose part channel: a face
    region (parts 23/24) and a body region."""
    lbl = rng.randn(b, h, w, 6).astype(np.float32) * 0.1
    part = np.zeros((b, h, w), np.float32)
    part[:, h // 8: h // 4, w // 3: 2 * w // 3] = 23 / 24 * 2 - 1  # face
    part[:, h // 4: 7 * h // 8, w // 3: 2 * w // 3] = 2 / 24 * 2 - 1  # torso
    lbl[..., 2] = part
    # openpose channels nonzero on the face
    lbl[:, h // 8: h // 4, w // 3: 2 * w // 3, 3:] = 0.5
    return lbl


class TestPoseMasks:
    def test_fg_mask(self, rng):
        cfg = tiny_pose_cfg()
        lbl = jnp.asarray(pose_label(rng, 2, 64, 32))
        fg = get_fg_mask(cfg, lbl)
        assert fg.shape == (2, 64, 32, 1)
        assert float(fg.max()) == 1.0  # body region found

    def test_part_and_face_masks(self, rng):
        lbl = pose_label(rng, 1, 64, 32)
        parts = get_part_mask(jnp.asarray(lbl[..., 2]))
        assert parts.shape == (1, 64, 32, 9)
        face = get_face_mask(jnp.asarray(lbl[..., 2]))
        assert float(face[0, 10, 16]) == 1.0  # face region
        assert float(face[0, 40, 16]) == 0.0  # torso region

    def test_remove_face_labels(self, rng):
        cfg = tiny_pose_cfg(remove_face_labels=True)
        lbl = jnp.asarray(pose_label(rng, 1, 64, 32))
        out = use_valid_labels(cfg, lbl)
        assert out.shape == lbl.shape
        # densepose channels set to -1 in the face region
        np.testing.assert_allclose(np.asarray(out[0, 10, 16, :3]), -1.0)
        # openpose channels untouched
        np.testing.assert_allclose(np.asarray(out[..., 3:]),
                                   np.asarray(lbl[..., 3:]))

    def test_pose_type_open(self, rng):
        cfg = tiny_pose_cfg(pose_type="open")
        lbl = jnp.asarray(pose_label(rng, 1, 64, 32))
        assert use_valid_labels(cfg, lbl).shape[-1] == 3

    def test_one_hot_encode(self):
        cfg = tiny_pose_cfg().replace(label_nc=5)
        lbl = jnp.asarray([[[[2]], [[4]]]], jnp.float32)  # (1,2,1,1)
        onehot = encode_label(cfg, lbl)
        assert onehot.shape == (1, 2, 1, 5)
        assert float(onehot[0, 0, 0, 2]) == 1.0


class TestFaceBoxes:
    def test_boxes_from_openpose(self, rng):
        cfg = tiny_pose_cfg(remove_face_labels=False)
        lbl = jnp.asarray(pose_label(rng, 2, 64, 32))
        boxes = get_face_boxes(cfg, lbl)
        assert boxes.shape == (2, 4)
        ys, ye, xs, xe = np.asarray(boxes[0])
        assert ye > ys and xe > xs
        assert ye - ys == xe - xs  # square

    def test_crop_and_paste_roundtrip(self, rng):
        cfg = tiny_pose_cfg()
        lbl = jnp.asarray(pose_label(rng, 1, 64, 32))
        img = jnp.asarray(np.tanh(rng.randn(1, 64, 32, 3)).astype(np.float32))
        fs = face_size_of(cfg)
        face = crop_face_region(cfg, img, lbl)
        assert face.shape == (1, fs, fs, 3)
        pasted = replace_face_region(cfg, img, jnp.zeros_like(face), lbl,
                                     fake_face_coarse=face)
        assert pasted.shape == img.shape
        assert np.isfinite(np.asarray(pasted)).all()


class TestPoseTrainStep:
    def test_full_pose_step_with_face_D_and_refiner(self, rng):
        cfg = tiny_pose_cfg()
        models = build_models(cfg)
        assert models.netDf is not None and models.netGf is not None
        h, w = cfg.height, cfg.width
        b = 2
        batch = {
            "tgt_label": jnp.asarray(pose_label(rng, b, h, w)),
            "tgt_image": jnp.asarray(
                np.tanh(rng.randn(b, h, w, 3)).astype(np.float32)),
            "ref_labels": jnp.asarray(pose_label(rng, b, h, w)[:, None]),
            "ref_images": jnp.asarray(
                np.tanh(rng.randn(b, 1, h, w, 3)).astype(np.float32)),
            # teacher flow for the reference branch
            "flow_gt": [jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
                        None],
            "conf_gt": [jnp.ones((b, h, w, 1), jnp.float32), None],
        }
        state = init_state(cfg, models, jax.random.PRNGKey(0), batch)
        prevs = init_prevs(cfg, batch)
        new_state, prevs, losses, _ = train_step(
            cfg, models, state, batch, prevs, StepFlags(False, False),
            jax.random.PRNGKey(1))
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        # pose-specific losses active
        assert float(losses["F_Flow"]) != 0.0        # teacher supervision
        assert float(jnp.abs(losses["Df_real"]) + jnp.abs(losses["Df_fake"])) > 0
        assert float(losses["F_Mask"]) != 0.0
        # face generator received gradients
        gf0 = jax.tree.leaves(state.params_G["Gf"])[0]
        gf1 = jax.tree.leaves(new_state.params_G["Gf"])[0]
        assert not np.allclose(np.asarray(gf0), np.asarray(gf1))
