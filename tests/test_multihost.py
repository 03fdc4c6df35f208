"""Multi-host (multi-controller) smoke tests.

Replaces the reference's torch.distributed/NCCL layer
(/root/reference/util/distributed.py:15-26,
/root/reference/data/custom_dataset_data_loader.py:20-23): two OS processes
run `jax.distributed.initialize` against a local coordinator, verify the
global device view, run a cross-process psum, and check that SequenceLoader
shards the dataset disjointly by process.

These spawn fresh subprocesses (NOT the conftest-forced CPU platform of this
process) so they exercise the real init path train.py uses.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest


pytestmark = pytest.mark.slow  # >60s on one CPU (see pytest.ini)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    # cross-process collective: psum of process_index over the global mesh
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.multihost_utils import process_allgather
    got = process_allgather(np.asarray([float(jax.process_index())]))
    assert got.tolist() == [[0.0], [1.0]], got

    # loader sharding: each process fills disjoint slots of the global batch
    # (loader.py::_sample global_slot = shard_id * local_batch + slot)
    sys.path.insert(0, {repo!r})
    from fsvid2vid_tpu.config import face_config
    from fsvid2vid_tpu.data.loader import SequenceLoader
    cfg = face_config(batch_size=2, fine_size=32, load_size=32, ngf=4,
                      dataroot={fixture!r}, num_workers=0)
    loader = SequenceLoader(cfg, steps_per_epoch=2,
                            shard_id=jax.process_index(),
                            num_shards=jax.process_count(), seed=0)
    loader.set_epoch_frames(2)
    batch = next(iter(loader.epoch(0)))
    assert batch["tgt_label"].shape[0] == 1  # local share of global batch 2
    print("SHARD", jax.process_index(), ";".join(batch["paths"]), flush=True)
    print("WORKER_OK", jax.process_index(), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def face_fixture(tmp_path_factory):
    """Minimal synthetic face dataset (4 sequences)."""
    import numpy as np
    from PIL import Image
    root = tmp_path_factory.mktemp("mh_face")
    rng = np.random.RandomState(0)
    for seq in range(4):
        kdir = root / "train_keypoints" / f"seq{seq}"
        idir = root / "train_images" / f"seq{seq}"
        kdir.mkdir(parents=True)
        idir.mkdir(parents=True)
        for t in range(3):
            pts = rng.rand(68, 2) * 28 + 2
            np.savetxt(kdir / f"{t:04d}.txt", pts, delimiter=",")
            Image.fromarray(
                (rng.rand(32, 32, 3) * 255).astype("uint8")).save(
                idir / f"{t:04d}.jpg")
    return str(root)


class TestTwoProcessCPU:
    def test_distributed_init_collective_and_loader_shards(self, face_fixture):
        port = _free_port()
        coord = f"127.0.0.1:{port}"
        script = WORKER.format(repo=REPO, fixture=face_fixture)
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        procs = [subprocess.Popen(
            [sys.executable, "-c", script, coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO) for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}"
            assert f"WORKER_OK {i}" in out, out
        shards = []
        for out in outs:
            for line in out.splitlines():
                if line.startswith("SHARD"):
                    shards.append(set(line.split(" ", 2)[2].split(";")))
        assert len(shards) == 2
        # each host draws a different slice of the global batch
        assert shards[0].isdisjoint(shards[1]), shards
