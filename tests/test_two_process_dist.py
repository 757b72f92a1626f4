"""A TRUE two-process jax.distributed run (VERDICT r2 missing #5 / task 8).

Every other multi-host behavior in this suite is simulated in-process
with rank/world parameters.  Here two real OS processes rendezvous over
a local coordinator (CPU backend) using the REFERENCE's env:// variable
names (MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE — dist_utils.py:57-76),
then exercise:

  * init_distributed_mode + process_count/process_index
  * all_reduce_scalar (metric sync, logger.py:43-48 equivalent)
  * barrier
  * BaseTask.save_result per-rank shard + rank-0 merge with dedup
    (base_task.py:355-393) — including the write→merge barrier a real
    grid needs (rank 0 must not merge before rank 1's shard lands)
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from vlm_compression_tpu.common.dist import (
    all_reduce_scalar, barrier, get_rank, get_world_size,
    init_distributed_mode, is_main_process)
from vlm_compression_tpu.tasks.base import BaseTask

init_distributed_mode()
assert get_world_size() == 2, get_world_size()
r = get_rank()
assert is_main_process() == (r == 0)

s = all_reduce_scalar(float(r + 1), "sum")      # 1 + 2
mx = all_reduce_scalar(float(10 * r), "max")    # max(0, 10)
barrier()

out_dir = sys.argv[1]
items = [{"question_id": 10 * r + i, "answer": f"proc{r}"}
         for i in range(3)]
items.append({"question_id": 999, "answer": "dup"})  # emitted by BOTH ranks
final = BaseTask.save_result(items, out_dir, "res",
                             remove_duplicate="question_id")
barrier()
print(json.dumps({"rank": r, "sum": s, "max": mx, "final": final}),
      flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_allreduce_and_result_merge(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out_dir = tmp_path / "results"

    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo",
                   MASTER_ADDR="127.0.0.1",
                   MASTER_PORT=str(port),
                   RANK=str(rank),
                   WORLD_SIZE="2")
        env.pop("XLA_FLAGS", None)  # no forced 8-device host mesh here
        procs.append(subprocess.Popen(
            [sys.executable, str(worker), str(out_dir)],
            env=env, cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=180)
        assert p.returncode == 0, stderr[-2000:]
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    by_rank = {o["rank"]: o for o in outs}
    assert set(by_rank) == {0, 1}
    for o in outs:  # collectives agree on every process
        assert o["sum"] == 3.0
        assert o["max"] == 10.0

    merged = json.load(open(out_dir / "res.json"))
    qids = sorted(item["question_id"] for item in merged)
    # 3 unique per rank + the duplicate exactly once
    assert qids == [0, 1, 2, 10, 11, 12, 999]
    # both per-rank shards were written
    assert (out_dir / "res_rank0.json").exists()
    assert (out_dir / "res_rank1.json").exists()
