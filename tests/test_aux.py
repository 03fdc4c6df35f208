"""Tests for auxiliary subsystems: preprocessing/tracking, packed store,
image pool, imaging converters, HTML writer."""
import json
import os

import numpy as np
import pytest

from fsvid2vid_tpu.data import preprocess as pp
from fsvid2vid_tpu.data.packed import PackedStoreWriter, PackedStore, pack_directory
from fsvid2vid_tpu.utils.image_pool import ImagePool
from fsvid2vid_tpu.utils.imaging import (
    tensor2im, tensor2label, tensor2flow, labelcolormap, tile_images)
from fsvid2vid_tpu.utils.html import HTML


def make_person(x0, y0, height=300.0, conf=0.9):
    pose = np.zeros((25, 3))
    pose[:, 0] = x0 + np.linspace(0, 30, 25)
    pose[:, 1] = y0 + np.linspace(0, height, 25)
    pose[:, 2] = conf
    return {"pose_keypoints_2d": pose.reshape(-1).tolist(),
            "face_keypoints_2d": np.zeros(210).tolist(),
            "hand_left_keypoints_2d": np.zeros(63).tolist(),
            "hand_right_keypoints_2d": np.zeros(63).tolist()}


class TestPreprocess:
    def test_full_body_and_validity(self):
        p = make_person(100, 10)
        assert pp.is_full_body(p)
        assert pp.is_valid_frame([p])
        assert not pp.is_valid_frame([])

    def test_overlap(self):
        a = pp.keypoint_array(make_person(100, 10))
        b = pp.keypoint_array(make_person(110, 10))
        c = pp.keypoint_array(make_person(500, 10))
        assert pp.has_overlap(a, b)
        assert not pp.has_overlap(a, c)

    def test_motion_detection(self):
        a = [make_person(100, 10)]
        b = [make_person(100, 10)]
        c = [make_person(130, 10)]
        assert pp.detect_motion(None, a)
        assert not pp.detect_motion(a, b)
        assert pp.detect_motion(a, c)

    def test_static_ranges(self):
        frames = [(i, [make_person(100, 10)]) for i in range(12)]
        ranges = pp.static_frame_ranges(frames)
        assert ranges and ranges[0][1] - ranges[0][0] > pp.MAX_STATIC_FRAMES

    def test_isolated_ranges(self):
        idx = list(range(0, 5)) + list(range(50, 120))
        ranges = pp.isolated_frame_ranges(idx, min_n_of_frames=30)
        assert ranges[0][1] == 4

    def test_tracking_and_subsequences(self, tmp_path):
        # one person walking right for 80 frames; a second appears at frame 40
        frames = []
        for i in range(80):
            people = [make_person(100 + i * 2, 10)]
            if i >= 40:
                people.append(make_person(900 - i, 10))
            frames.append(people)
        starts, ends, ppl = pp.divide_sequences(frames, min_n_of_frames=20)
        assert len(starts) >= 2  # both tracks become subsequences
        lengths = [e - s for s, e in zip(starts, ends)]
        assert all(l > 20 for l in lengths)

        # directory driver
        root = tmp_path
        seq = root / "train_openpose" / "01"
        seq.mkdir(parents=True)
        for i, people in enumerate(frames):
            with open(seq / f"frame{i:06d}.json", "w") as f:
                json.dump({"people": people}, f)
        out = pp.preprocess_dataset(str(root))
        assert os.path.exists(root / "all_subsequences.json")
        assert len(out["seq_indices"]) == len(starts)


class TestPackedStore:
    def test_roundtrip(self, tmp_path, rng):
        from PIL import Image
        src = tmp_path / "src" / "seq"
        src.mkdir(parents=True)
        arr = rng.randint(0, 255, (16, 16, 3), np.uint8)
        Image.fromarray(arr).save(src / "a.png")
        (src / "b.txt").write_text("1,2\n3,4")
        n = pack_directory(str(tmp_path / "src"), str(tmp_path / "packed"))
        assert n == 2
        store = PackedStore(str(tmp_path / "packed"))
        img, _ = store.getitem_by_path("seq/a.png", is_img=True)
        np.testing.assert_array_equal(np.asarray(img), arr)
        raw, _ = store.getitem_by_path("seq/b.txt", is_img=False)
        assert bytes(raw) == b"1,2\n3,4"


class TestImagePool:
    def test_passthrough_when_zero(self, rng):
        pool = ImagePool(0)
        x = rng.randn(4, 8, 8, 3).astype(np.float32)
        np.testing.assert_array_equal(pool.query(x), x)

    def test_replay(self, rng):
        pool = ImagePool(4, seed=0)
        a = rng.randn(4, 2, 2, 1).astype(np.float32)
        out1 = pool.query(a)
        np.testing.assert_array_equal(out1, a)  # pool filling
        b = rng.randn(4, 2, 2, 1).astype(np.float32)
        out2 = pool.query(b)
        assert out2.shape == b.shape  # mix of replayed + current

    def test_split_phase_api(self, rng):
        """begin_step/commit (used by the jitted train step): filling phase
        returns no swaps; once full, swapped slots return stored fakes and
        are overwritten by the committed batch."""
        pool = ImagePool(2, seed=0)
        a = rng.randn(2, 2, 2, 1).astype(np.float32)
        fake, mask = pool.begin_step(2, (2, 2, 1))
        assert not mask.any()  # pool empty: D sees current fakes
        pool.commit(a)
        assert pool.num_imgs == 2
        stored_before = [im.copy() for im in pool.images]
        # run until at least one swap happens (50% per sample once full)
        b = rng.randn(2, 2, 2, 1).astype(np.float32)
        swapped = False
        for _ in range(20):
            fake, mask = pool.begin_step(2, (2, 2, 1))
            if mask.any():
                swapped = True
                i = int(np.nonzero(mask[:, 0, 0, 0])[0][0])
                # returned replacement is one of the stored images
                assert any(np.allclose(fake[i], s) for s in pool.images)
                break
            pool.commit(b)
        assert swapped
        pool.commit(b)
        # each swapped slot holds the LAST committed fake written to it
        # (samples may pick the same slot; later samples overwrite, matching
        # query()'s sequential replacement)
        j = int(np.nonzero(mask[:, 0, 0, 0])[0][-1])
        assert any(np.allclose(im, b[j]) for im in pool.images)
        del stored_before


class TestImaging:
    def test_tensor2im(self, rng):
        x = rng.uniform(-1, 1, (2, 8, 8, 3)).astype(np.float32)
        im = tensor2im(x)
        assert im.shape == (8, 8, 3) and im.dtype == np.uint8

    def test_tensor2label(self, rng):
        onehot = np.eye(20)[rng.randint(0, 20, (8, 8))].astype(np.float32)
        lab = tensor2label(onehot, 20)
        assert lab.shape == (8, 8, 3)
        assert labelcolormap(20).shape == (20, 3)
        assert labelcolormap(35).shape == (35, 3)
        assert labelcolormap(7).shape == (7, 3)

    def test_tensor2flow(self, rng):
        flow = rng.randn(8, 8, 2).astype(np.float32) * 5
        im = tensor2flow(flow)
        assert im.shape == (8, 8, 3) and im.dtype == np.uint8

    def test_tile(self, rng):
        imgs = [np.zeros((4, 4, 3), np.uint8)] * 5
        tiled = tile_images(imgs, picturesPerRow=4)
        assert tiled.shape == (8, 16, 3)


class TestHTML:
    def test_page(self, tmp_path):
        page = HTML(str(tmp_path), "t")
        page.add_header("frame 0")
        page.add_images(["a.png"], ["a"], ["a.png"])
        out = page.save()
        content = open(out).read()
        assert "frame 0" in content and "a.png" in content
