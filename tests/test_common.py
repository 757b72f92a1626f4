"""Registry, config trees, mesh/sharding infrastructure."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vlm_compression_tpu.common.config import Config, ConfigNode, apply_dot_overrides
from vlm_compression_tpu.common.registry import Registry
from vlm_compression_tpu.parallel.mesh import (
    MeshConfig, make_mesh, shard_params, data_sharding,
)


def test_registry_roundtrip():
    r = Registry()

    @r.register_pruner("toy")
    class Toy:
        pass

    assert r.get_pruner_class("toy") is Toy
    assert r.list_names("pruner") == ["toy"]
    try:
        r.get_pruner_class("missing")
        assert False
    except KeyError as e:
        assert "toy" in str(e)


def test_config_tree_and_overrides():
    cfg = ConfigNode({"run": {"lr": 1e-4, "task": "vqa"}, "model": {"arch": "x"}})
    assert cfg.run.lr == 1e-4
    apply_dot_overrides(cfg, ["run.lr=0.01", "run.new.deep=true", "model.arch=y"])
    assert cfg.run.lr == 0.01
    assert cfg.run.new.deep is True
    assert cfg.model.arch == "y"
    d = cfg.to_dict()
    assert isinstance(d["run"], dict) and not isinstance(d["run"], ConfigNode)


def test_config_defaults_merge(tmp_path):
    default = tmp_path / "default.yaml"
    default.write_text("model:\n  arch: blip2\n  hidden: 16\n  depth: 2\n")
    user = tmp_path / "user.yaml"
    user.write_text("model:\n  arch: blip2\n  hidden: 32\nrun:\n  task: vqa\n")
    cfg = Config(str(user), defaults={"blip2": str(default)})
    assert cfg.model_cfg.hidden == 32   # user wins
    assert cfg.model_cfg.depth == 2     # default fills
    assert cfg.run_cfg.task == "vqa"


def test_mesh_and_sharding(devices8):
    mesh = make_mesh(MeshConfig(data=4, model=2), devices=devices8)
    assert mesh.shape == {"data": 4, "model": 2}

    params = {
        "encoder": {
            "attn": {"query": {"kernel": jnp.ones((16, 8))}},
            "mlp": {"wo": {"kernel": jnp.ones((8, 16))}},
            "ln": {"scale": jnp.ones((16,))},
        }
    }
    sharded = shard_params(params, mesh)
    q = sharded["encoder"]["attn"]["query"]["kernel"]
    wo = sharded["encoder"]["mlp"]["wo"]["kernel"]
    ln = sharded["encoder"]["ln"]["scale"]
    assert q.sharding.spec == P(None, "model")
    assert wo.sharding.spec == P("model", None)
    assert ln.sharding.spec == P()


def test_sharding_fallback_when_indivisible(devices8):
    mesh = make_mesh(MeshConfig(data=2, model=4), devices=devices8)
    params = {"attn": {"query": {"kernel": jnp.ones((6, 6))}}}  # 6 % 4 != 0
    sharded = shard_params(params, mesh)
    assert sharded["attn"]["query"]["kernel"].sharding.spec == P()


def test_data_parallel_psum_step(devices8):
    """A sharded train-step: grads reduce across the data axis implicitly."""
    mesh = make_mesh(MeshConfig(data=8, model=1), devices=devices8)
    w = jax.device_put(jnp.ones((4, 4)), jax.sharding.NamedSharding(mesh, P()))
    x = jax.device_put(jnp.ones((16, 4)), data_sharding(mesh))

    @jax.jit
    def step(w, x):
        def loss(w):
            return jnp.mean((x @ w) ** 2)
        return jax.grad(loss)(w)

    g = step(w, x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g)[0:1].repeat(4, 0))
