"""Data pipeline tests: rasterizer parity vs scipy curve_fit, transforms,
and the three datasets on synthetic fixture trees."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from fsvid2vid_tpu.config import face_config, pose_config, street_config
from fsvid2vid_tpu.data.rasterize import (
    interp_points, draw_edge, draw_face_edges, face_part_list,
    add_upper_face_points, read_keypoints)
from fsvid2vid_tpu.data.transforms import (
    get_img_params, get_video_params, apply_transform)
from fsvid2vid_tpu.data.loader import SequenceLoader, create_dataset


class TestInterpPoints:
    def test_matches_scipy_curve_fit(self, rng):
        from scipy.optimize import curve_fit

        def func(x, a, b, c):
            return a * x ** 2 + b * x + c

        x = np.array([3.0, 30.0, 55.0])
        y = np.array([10.0, 20.0, 15.0])  # x-spread dominates: no transpose
        popt, _ = curve_fit(func, x, y)
        ours = np.polyfit(x, y, 2)
        np.testing.assert_allclose(ours, popt, atol=1e-6)

        cx, cy = interp_points(x, y)
        assert cx is not None
        assert cx[0] == 3 and cx[-1] == 55
        np.testing.assert_allclose(cy.astype(float),
                                   np.polyval(popt, cx.astype(float)),
                                   rtol=0, atol=1.5)  # int truncation

    def test_two_points_linear(self):
        cx, cy = interp_points(np.array([0.0, 10.0]), np.array([0.0, 20.0]))
        assert cx is not None and cy[-1] == 20

    def test_steep_curve_transposes(self):
        # mostly-vertical edge: interpolation happens along y
        cx, cy = interp_points(np.array([5.0, 6.0]), np.array([0.0, 50.0]))
        assert cy is not None and len(cy) > 10

    def test_too_curved_returns_none(self):
        # no transpose (x steps >= y steps) but quadratic coefficient > 1
        x = np.array([0.0, 0.5, 1.0])
        y = np.array([0.5, 0.0, 0.5])  # a = 2 > 1
        assert interp_points(x, y) == (None, None)


class TestDrawing:
    def test_draw_edge_stamps_pixels(self):
        im = np.zeros((32, 32, 3), np.uint8)
        draw_edge(im, np.arange(5, 25), np.full(20, 16), bw=2,
                  color=(153, 0, 51), draw_end_points=True)
        assert (im[16, 10] == [153, 0, 51]).all()
        assert im.sum() > 0

    def test_face_edges(self):
        rng = np.random.RandomState(0)
        # roughly face-shaped 68 points in a 64x64 box
        t = np.linspace(0, np.pi, 17)
        kp = np.zeros((68, 2))
        kp[:17, 0] = 32 + 25 * np.cos(t)
        kp[:17, 1] = 28 + 28 * np.sin(t)
        kp[17:] = rng.uniform(16, 48, (51, 2))
        kp83 = add_upper_face_points(kp)
        assert kp83.shape == (83, 2)
        im = draw_face_edges(kp83, face_part_list(True), (64, 64), bw=1)
        assert im.shape == (64, 64) and im.max() == 255


class TestOpenposeRaster:
    def _fake_person(self, scale=1.0, offset=0.0):
        rng = np.random.RandomState(3)
        pose = np.zeros((25, 3))
        pose[:, 0] = rng.uniform(40, 90, 25) * scale + offset
        pose[:, 1] = np.linspace(20, 230, 25) * scale + offset
        pose[:, 2] = 0.9
        face = np.zeros((70, 3))
        face[:, 0] = rng.uniform(55, 75, 70)
        face[:, 1] = rng.uniform(15, 40, 70)
        face[:, 2] = 0.9
        hand = np.zeros((21, 3))
        hand[:, :2] = rng.uniform(30, 60, (21, 2))
        hand[:, 2] = 0.9
        return {"pose_keypoints_2d": pose.reshape(-1).tolist(),
                "face_keypoints_2d": face.reshape(-1).tolist(),
                "hand_left_keypoints_2d": hand.reshape(-1).tolist(),
                "hand_right_keypoints_2d": hand.reshape(-1).tolist()}

    def test_renders_largest_person(self):
        doc = json.dumps({"people": [self._fake_person(0.4),
                                     self._fake_person(1.0)]})
        rng = np.random.RandomState(0)
        img, pose_pts, face_pts = read_keypoints(
            doc, (128, 256), False, False, False, rng)
        assert img.shape == (256, 128, 3) and img.max() > 0
        # largest person selected: spans most of the height
        ys = pose_pts[pose_pts[:, 1] > 0][:, 1]
        assert ys.max() - ys.min() > 150


class TestTransforms:
    def test_img_params_deterministic(self):
        cfg = face_config(fine_size=64, load_size=64)
        p1 = get_img_params(cfg, (64, 64), np.random.RandomState(7))
        p2 = get_img_params(cfg, (64, 64), np.random.RandomState(7))
        assert p1 == p2

    def test_apply_transform_range(self):
        cfg = face_config(fine_size=64, load_size=64, is_train=False)
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (80, 70, 3), np.uint8))
        params = get_img_params(cfg, (64, 64), np.random.RandomState(1))
        out = apply_transform(cfg, img, params)
        assert out.shape[-1] == 3
        assert -1.0 <= out.min() and out.max() <= 1.0

    def test_video_params_window(self):
        cfg = face_config(n_shot=2)
        rng = np.random.RandomState(0)
        nft, start, step, refs = get_video_params(cfg, 8, 100, 5, rng)
        assert nft == 8 and len(refs) == 2
        assert all(abs(r - start) >= 14 or r < max(1, start - 14) for r in refs)
        end = start + (nft - 1) * step
        assert end < 100


# ---------------------------------------------------------------------------
# synthetic dataset fixtures
# ---------------------------------------------------------------------------

@pytest.fixture
def face_root(tmp_path):
    rng = np.random.RandomState(0)
    for seq in ["0001", "0002"]:
        kdir = tmp_path / "train_keypoints" / seq
        idir = tmp_path / "train_images" / seq
        kdir.mkdir(parents=True)
        idir.mkdir(parents=True)
        for f in range(8):
            t = np.linspace(0, np.pi, 17)
            kp = np.zeros((68, 2))
            kp[:17, 0] = 60 + 40 * np.cos(t) + rng.randn() * 2
            kp[:17, 1] = 55 + 45 * np.sin(t) + rng.randn() * 2
            kp[17:] = rng.uniform(40, 80, (51, 2))
            np.savetxt(kdir / f"{f:05d}.txt", kp, delimiter=",")
            arr = rng.randint(0, 255, (128, 128, 3), np.uint8)
            Image.fromarray(arr).save(idir / f"{f:05d}.jpg")
    return str(tmp_path)


@pytest.fixture
def street_root(tmp_path):
    rng = np.random.RandomState(0)
    for seq in ["s1"]:
        ldir = tmp_path / "train_labels" / seq
        idir = tmp_path / "train_images" / seq
        ldir.mkdir(parents=True)
        idir.mkdir(parents=True)
        for f in range(6):
            lbl = rng.randint(0, 35, (64, 128), np.uint8)
            Image.fromarray(lbl).save(ldir / f"{f:05d}.png")
            arr = rng.randint(0, 255, (64, 128, 3), np.uint8)
            Image.fromarray(arr).save(idir / f"{f:05d}.png")
    return str(tmp_path)


@pytest.fixture
def pose_root(tmp_path):
    rng = np.random.RandomState(0)
    for seq in ["01"]:
        for sub in ["train_images", "train_openpose", "train_densepose"]:
            (tmp_path / sub / seq).mkdir(parents=True)
        for f in range(6):
            arr = rng.randint(0, 255, (256, 128, 3), np.uint8)
            Image.fromarray(arr).save(
                tmp_path / "train_images" / seq / f"{f:05d}.jpg")
            pose = np.zeros((25, 3))
            pose[:, 0] = rng.uniform(30, 100, 25)
            pose[:, 1] = np.linspace(20, 230, 25)
            pose[:, 2] = 0.9
            person = {"pose_keypoints_2d": pose.reshape(-1).tolist(),
                      "face_keypoints_2d": np.zeros(210).tolist(),
                      "hand_left_keypoints_2d": np.zeros(63).tolist(),
                      "hand_right_keypoints_2d": np.zeros(63).tolist()}
            with open(tmp_path / "train_openpose" / seq / f"{f:05d}.json",
                      "w") as fp:
                json.dump({"people": [person]}, fp)
            dp = rng.randint(0, 255, (256, 128, 3), np.uint8)
            Image.fromarray(dp).save(
                tmp_path / "train_densepose" / seq / f"{f:05d}.png")
    return str(tmp_path)


class TestDatasets:
    def test_face_dataset_shapes(self, face_root):
        cfg = face_config(dataroot=face_root, fine_size=64, load_size=64,
                          n_shot=1)
        ds = create_dataset(cfg)
        ds.n_frames_total = 2
        out = ds.sample(0, np.random.RandomState(0))
        assert out["tgt_label"].shape == (2, 64, 64, 1)
        assert out["tgt_image"].shape == (2, 64, 64, 3)
        assert out["ref_labels"].shape == (1, 64, 64, 1)
        assert out["ref_images"].shape == (1, 64, 64, 3)
        assert out["tgt_label"].max() <= 1.0 and out["tgt_label"].min() >= 0.0
        assert out["tgt_image"].min() < 0  # normalized to [-1, 1]

    def test_street_dataset_shapes(self, street_root):
        cfg = street_config(dataroot=street_root, fine_size=128, load_size=128)
        ds = create_dataset(cfg)
        ds.n_frames_total = 2
        out = ds.sample(0, np.random.RandomState(0))
        assert out["tgt_label"].shape == (2, 64, 128, 1)
        assert out["tgt_image"].shape == (2, 64, 128, 3)
        # labels remapped to < 20 classes
        assert out["tgt_label"].max() < 20

    def test_pose_dataset_shapes(self, pose_root):
        cfg = pose_config(dataroot=pose_root, fine_size=64, load_size=64)
        ds = create_dataset(cfg)
        ds.n_frames_total = 2
        out = ds.sample(0, np.random.RandomState(0))
        assert out["tgt_label"].shape == (2, 128, 64, 6)
        assert out["tgt_image"].shape == (2, 128, 64, 3)
        assert out["ref_labels"].shape[0] == 1

    def test_loader_batches(self, face_root):
        cfg = face_config(dataroot=face_root, fine_size=64, load_size=64,
                          batch_size=2, num_workers=1)
        loader = SequenceLoader(cfg, steps_per_epoch=3)
        loader.set_epoch_frames(2)
        batches = list(loader.epoch(1))
        assert len(batches) == 3
        b = batches[0]
        assert b["tgt_label"].shape == (2, 2, 64, 64, 1)
        assert b["ref_images"].shape == (2, 1, 64, 64, 3)

    def test_loader_host_sharding(self, face_root):
        cfg = face_config(dataroot=face_root, fine_size=64, load_size=64,
                          batch_size=4, num_workers=0)
        l0 = SequenceLoader(cfg, steps_per_epoch=1, shard_id=0, num_shards=2)
        l1 = SequenceLoader(cfg, steps_per_epoch=1, shard_id=1, num_shards=2)
        for l in (l0, l1):
            l.set_epoch_frames(1)
        b0 = next(iter(l0.epoch(0)))
        b1 = next(iter(l1.epoch(0)))
        assert b0["tgt_image"].shape[0] == 2  # half the global batch each
        assert not np.allclose(b0["tgt_image"], b1["tgt_image"])


class TestNativeRasterizer:
    def test_native_matches_python(self, rng):
        from fsvid2vid_tpu.data import rasterize as R
        if R._NATIVE is None:
            pytest.skip("native library not built")
        x = np.arange(5, 55)
        y = (16 + 8 * np.sin(np.linspace(0, 3, 50))).astype(int)
        for channels, color in [(3, (153, 0, 51)), (1, (255,))]:
            shape = (64, 64, 3) if channels == 3 else (64, 64)
            im_py = np.zeros(shape, np.uint8)
            im_c = np.zeros(shape, np.uint8)
            R.draw_edge(im_py, x, y, bw=2, color=color, draw_end_points=True,
                        native=False)
            R.draw_edge(im_c, x, y, bw=2, color=color, draw_end_points=True,
                        native=True)
            np.testing.assert_array_equal(im_py, im_c)
        # overlapping second edge exercises the averaging path
        im_py = np.zeros((64, 64, 3), np.uint8)
        im_c = np.zeros((64, 64, 3), np.uint8)
        for im, nat in [(im_py, False), (im_c, True)]:
            R.draw_edge(im, x, y, bw=2, color=(153, 0, 51), native=nat)
            R.draw_edge(im, x, y + 1, bw=2, color=(0, 102, 153), native=nat)
        np.testing.assert_array_equal(im_py, im_c)

    def test_native_speedup(self, rng):
        from fsvid2vid_tpu.data import rasterize as R
        if R._NATIVE is None:
            pytest.skip("native library not built")
        import time
        x = np.arange(0, 200)
        y = (100 + 60 * np.sin(np.linspace(0, 3, 200))).astype(int)

        def run(native):
            im = np.zeros((256, 256, 3), np.uint8)
            t0 = time.perf_counter()
            for _ in range(50):
                R.draw_edge(im, x, y, bw=3, color=(153, 0, 51),
                            draw_end_points=True, native=native)
            return time.perf_counter() - t0
        t_py = run(False)
        t_c = run(True)
        assert t_c < t_py  # native data plane is faster
