"""zoo_sim_matrix vs a NumPy oracle (VERDICT r3 #6) + the ALPRO retrieval
path (round-3 ADVICE: the shipped alpro ret configs crashed in the BLIP
branch).

The oracle rebuilds the reference's rerank scoring independently of the
task's loop structure (albef_models/__init__.py:80-199,
alpro_retrieval.py:242-395): ITC matrix from the unimodal projections;
then, for every row, the k_test ITC-best candidates get the RAW fp32
itm_head logit column 1 added, everything else sits at -100; BLIP-1 swaps
token 0 to enc_token_id for the ITM pass only.  The oracle computes the
FULL pairwise ITM logit matrix once and applies the rank mask — any
indexing/transpose/scatter error in zoo_sim_matrix's per-row loop breaks
the comparison.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.models import load_model
from vlm_compression_tpu.tasks.retrieval import RetrievalTask, zoo_sim_matrix

pytestmark = pytest.mark.slow

N_IMG, N_TXT, K = 3, 5, 2


def _inputs(module, seed=0, video=False):
    rng = np.random.RandomState(seed)
    if video:
        t = module.cfg.timesformer.num_frames
        s = module.cfg.timesformer.img_size
        imgs = jnp.asarray(rng.standard_normal((N_IMG, t, s, s, 3)),
                           jnp.float32)
    else:
        s = module.cfg.vit.img_size
        imgs = jnp.asarray(rng.standard_normal((N_IMG, s, s, 3)),
                           jnp.float32)
    ids = jnp.asarray(rng.randint(4, 50, (N_TXT, 7)), jnp.int32)
    mask = jnp.ones((N_TXT, 7), jnp.int32)
    return imgs, ids, mask


def _itc_features(module, variables, imgs, ids, mask, video=False):
    """Unimodal projections + hidden states, straight from the module."""
    def text_fn(m, i, mk):
        txt = m.unimodal_text(i, mk)
        ft = m.text_proj(txt[:, 0].astype(jnp.float32))
        return ft / jnp.linalg.norm(ft, axis=-1, keepdims=True), txt

    def img_fn(m, im):
        emb = m.encode_video(im) if video else m.encode_image(im)
        fi = m.vision_proj(emb[:, 0].astype(jnp.float32))
        return fi / jnp.linalg.norm(fi, axis=-1, keepdims=True), emb

    ft, txt_hidden = module.apply(variables, ids, mask, method=text_fn)
    fi, img_embeds = module.apply(variables, imgs, method=img_fn)
    return np.asarray(fi), np.asarray(ft), img_embeds, txt_hidden


def _full_pair_itm(module, variables, t_arg_all, mask_all, img_embeds):
    """(n_img, n_txt) raw ITM logit column 1 for EVERY pair."""
    out = np.zeros((img_embeds.shape[0], t_arg_all.shape[0]), np.float32)
    for i in range(img_embeds.shape[0]):
        img = jnp.repeat(img_embeds[i:i + 1], t_arg_all.shape[0], axis=0)
        logits = module.apply(variables, t_arg_all, mask_all, img,
                              method=lambda m, t, mk, im:
                              m.itm_logits(t, mk, im))
        out[i] = np.asarray(logits.astype(jnp.float32))[:, 1]
    return out


def _oracle(sim, itm_full, k):
    """Expected rerank: top-k of each row gets sim+itm, rest -100."""
    out = np.full_like(sim, -100.0)
    for r in range(sim.shape[0]):
        topk = np.argsort(sim[r])[::-1][:k]
        out[r, topk] = sim[r, topk] + itm_full[r, topk]
    return out


def test_clip_pure_itc_matches_oracle():
    module, variables = load_model("clip", tiny=True, seed=0)
    imgs, ids, _ = _inputs(module, seed=1)
    i2t, t2i = zoo_sim_matrix(module, variables, [imgs[:2], imgs[2:]],
                              ids, None, k_test=0)
    ft = np.asarray(module.apply(variables, ids,
                                 method=lambda m, t: m.encode_text(t)))
    fi = np.asarray(module.apply(variables, imgs,
                                 method=lambda m, im: m.encode_image(im)))
    np.testing.assert_allclose(i2t, fi @ ft.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(t2i, (fi @ ft.T).T, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch,enc_token", [("blip_retrieval", 30522),
                                            ("blip_retrieval", None),
                                            ("albef_retrieval", None)])
def test_image_zoo_rerank_matches_oracle(arch, enc_token):
    module, variables = load_model(arch, tiny=True, seed=0)
    imgs, ids, mask = _inputs(module, seed=2)
    if enc_token is not None:
        # keep the swapped id inside the tiny vocab
        enc_token = int(module.cfg.med.vocab_size) - 1

    i2t, t2i = zoo_sim_matrix(module, variables, [imgs[:1], imgs[1:]],
                              ids, mask, k_test=K, enc_token_id=enc_token)

    albef = arch == "albef_retrieval"
    fi, ft, img_embeds, txt_hidden = _itc_features(
        module, variables, imgs, ids, mask)
    sim = fi @ ft.T
    itm_ids = ids if (albef or enc_token is None) \
        else ids.at[:, 0].set(enc_token)
    t_arg = txt_hidden if albef else itm_ids
    itm_full = _full_pair_itm(module, variables, t_arg, mask, img_embeds)

    np.testing.assert_allclose(i2t, _oracle(sim, itm_full, K),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(t2i, _oracle(sim.T, itm_full.T, K),
                               rtol=1e-4, atol=1e-4)
    # unranked entries sit at the reference's -100 floor
    assert (i2t == -100.0).sum() == N_IMG * (N_TXT - K)


def test_blip1_enc_token_changes_rerank():
    """The [ENC]-swap must actually reach the ITM pass (round-3 ADVICE)."""
    module, variables = load_model("blip_retrieval", tiny=True, seed=0)
    imgs, ids, mask = _inputs(module, seed=3)
    enc = int(module.cfg.med.vocab_size) - 1
    a, _ = zoo_sim_matrix(module, variables, [imgs], ids, mask, k_test=K,
                          enc_token_id=enc)
    b, _ = zoo_sim_matrix(module, variables, [imgs], ids, mask, k_test=K,
                          enc_token_id=None)
    ranked_a, ranked_b = a[a > -100.0], b[b > -100.0]
    assert ranked_a.shape == ranked_b.shape
    assert not np.allclose(ranked_a, ranked_b)


def test_alpro_rerank_matches_oracle():
    module, variables = load_model("alpro_retrieval", tiny=True, seed=0)
    vids, ids, mask = _inputs(module, seed=4, video=True)
    i2t, t2i = zoo_sim_matrix(module, variables, [vids[:2], vids[2:]],
                              ids, mask, k_test=K)
    fv, ft, vid_embeds, txt_hidden = _itc_features(
        module, variables, vids, ids, mask, video=True)
    sim = fv @ ft.T
    itm_full = _full_pair_itm(module, variables, txt_hidden, mask,
                              vid_embeds)
    np.testing.assert_allclose(i2t, _oracle(sim, itm_full, K),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(t2i, _oracle(sim.T, itm_full.T, K),
                               rtol=1e-4, atol=1e-4)


def test_alpro_retrieval_eval_from_config(tmp_path):
    """The shipped ALPRO retrieval config path end-to-end: video retrieval
    dataset (text/txt2img/img2txt + 'video' batches) → RetrievalTask →
    R@k — the round-3 ADVICE crash scenario."""
    import json

    from vlm_compression_tpu.common.config import ConfigNode
    from vlm_compression_tpu.datasets.builders import load_builder
    from vlm_compression_tpu.datasets.loaders import DataLoader
    from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer

    rng = np.random.RandomState(0)
    vid_dir = tmp_path / "videos"
    vid_dir.mkdir()
    anns = []
    for i in range(3):
        np.save(vid_dir / f"v{i}.npy",
                rng.randint(0, 255, (4, 24, 24, 3), np.uint8))
        anns.append({"video": f"v{i}.npy", "instance_id": str(i),
                     "caption": [f"clip number {i}", f"video {i} scene"]})
    ann = tmp_path / "ret.json"
    json.dump(anns, ann.open("w"))

    ds_cfg = ConfigNode({
        "build_info": {"annotations": {"test": [str(ann)]},
                       "images": {"storage": str(vid_dir)}},
        "vis_processor": {"eval": {"name": "alpro_video_eval",
                                   "image_size": 28, "n_frms": 2}},
        "text_processor": {"eval": {"name": "blip_caption"}},
    })
    builder = load_builder("msrvtt_retrieval", ds_cfg)
    datasets = builder.build_datasets()
    ds = datasets["test"]
    assert ds.text and ds.txt2img and ds.img2txt

    module, variables = load_model("alpro_retrieval", tiny=True, seed=0)

    class _M:
        pass

    m = _M()
    m.module, m.variables = module, variables
    task = RetrievalTask(k_test=2, tokenizer=SimpleTokenizer(
        vocab_size=module.cfg.med.vocab_size), max_txt_len=16)
    loader = DataLoader(ds, batch_size=2)
    result = task.evaluation(m, loader)
    metrics = task.after_evaluation(result, split_name="test",
                                    result_dir=str(tmp_path / "res"))
    for k in ("txt_r1", "img_r1", "agg_metrics"):
        assert k in metrics
        assert np.isfinite(metrics[k])
