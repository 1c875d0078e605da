"""Fabricate reference-layout Torch7 checkpoints for the import harness.

Builds the exact object tree the reference's `model:save` serializes
(`/root/reference/src/model/model.lua:724`):

    { {cnn Sequential, encoder_fw gModule, encoder_bw gModule,
       decoder gModule (with nested decoder_attn gModule),
       output_projector Sequential}, config, global_step, optim_state }

with every parameterized module carrying torch-native tensor layouts
(conv OIHW, nn.Linear (out, in), fused [i|f|o|g] gates).  The same weight
dict drives tests/torch_oracle.py, so the import pipeline is validated
end-to-end: t7 bytes -> torch_import mapping -> JAX forward == torch
forward.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from aocr import t7
from aocr.t7 import TorchObject
from aocr.models.cnn import _CONV_DEFS


def make_weights(rng: np.random.RandomState, enc_h: int, emb: int,
                 vocab: int, dec_layers: int = 2,
                 input_feed: bool = True) -> Dict:
    """Random reference-shaped weights (torch layouts), float32."""
    dec_h = 2 * enc_h
    w: Dict = {"cnn": {}, "bn": {}}
    for name, in_c, out_c, kh, kw, _pad, bn in _CONV_DEFS:
        w["cnn"][name] = {
            "weight": rng.uniform(-0.08, 0.08,
                                  (out_c, in_c, kh, kw)).astype(np.float32),
            "bias": rng.uniform(-0.05, 0.05, (out_c,)).astype(np.float32),
        }
        if bn:
            w["bn"][name] = {
                "weight": rng.uniform(0.8, 1.2, (out_c,)).astype(np.float32),
                "bias": rng.uniform(-0.1, 0.1, (out_c,)).astype(np.float32),
                "running_mean": rng.uniform(-0.2, 0.2,
                                            (out_c,)).astype(np.float32),
                "running_var": rng.uniform(0.5, 1.5,
                                           (out_c,)).astype(np.float32),
            }

    def linear(in_sz, out_sz):
        bound = 1.0 / np.sqrt(in_sz)
        return {
            "weight": rng.uniform(-bound, bound,
                                  (out_sz, in_sz)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (out_sz,)).astype(np.float32),
        }

    def enc_weights():
        return [  # single layer (reference encoder_num_layers default 1)
            {"i2h": linear(512, 4 * enc_h), "h2h": linear(enc_h, 4 * enc_h)}
        ]

    w["encoder_fw"] = enc_weights()
    w["encoder_bw"] = enc_weights()
    dec = {"embedding": rng.normal(0, 1, (vocab, emb)).astype(np.float32),
           "layers": []}
    for li in range(dec_layers):
        in_sz = (emb + (dec_h if input_feed else 0)) if li == 0 else dec_h
        dec["layers"].append({"i2h": linear(in_sz, 4 * dec_h),
                              "h2h": linear(dec_h, 4 * dec_h)})
    ba = 1.0 / np.sqrt(dec_h)
    bc = 1.0 / np.sqrt(2 * dec_h)
    dec["w_a"] = rng.uniform(-ba, ba, (dec_h, dec_h)).astype(np.float32)
    dec["w_c"] = rng.uniform(-bc, bc, (dec_h, 2 * dec_h)).astype(np.float32)
    w["decoder"] = dec
    w["projector"] = linear(dec_h, vocab)
    return w


def _conv_obj(name, cw, defs):
    _n, in_c, out_c, kh, kw, pad, _bn = defs
    p = 1 if pad == "SAME" else 0
    return TorchObject("cudnn.SpatialConvolution", {
        "weight": cw["weight"], "bias": cw["bias"],
        "gradWeight": np.zeros_like(cw["weight"]),
        "nInputPlane": in_c, "nOutputPlane": out_c,
        "kH": kh, "kW": kw, "dH": 1, "dW": 1, "padH": p, "padW": p,
        "train": False,
    })


def _bn_obj(bw):
    return TorchObject("nn.SpatialBatchNormalization", {
        "weight": bw["weight"], "bias": bw["bias"],
        "running_mean": bw["running_mean"],
        "running_var": bw["running_var"],
        "eps": 1e-5, "momentum": 0.1, "affine": True, "train": False,
    })


def _linear_obj(lw, classname="nn.Linear", name=None):
    fields = {"weight": lw["weight"]}
    if "bias" in lw:
        fields["bias"] = lw["bias"]
    if name:
        fields["name"] = name  # usePrealloc tag (memory.lua:62-63)
    return TorchObject(classname, fields)


def _plain(classname, **fields):
    return TorchObject(classname, fields)


def build_cnn_sequential(w) -> TorchObject:
    mods = [_plain("nn.AddConstant", constant_scalar=-128.0),
            _plain("nn.MulConstant", constant_scalar=1.0 / 128)]
    for defs in _CONV_DEFS:
        name = defs[0]
        mods.append(_conv_obj(name, w["cnn"][name], defs))
        if defs[6]:
            mods.append(_bn_obj(w["bn"][name]))
        mods.append(_plain("cudnn.ReLU", inplace=True))
        # pool placement mirrors createCNNModel (cnn.lua:15-40); pooling
        # modules carry no weights so position within the list is cosmetic
    mods.append(_plain("nn.View"))
    mods.append(_plain("nn.Transpose"))
    return _plain("nn.Sequential", modules=mods)


def build_lstm_gmodule(layers, model_name: str, tag_names: bool,
                       lookup=None, attn=None) -> TorchObject:
    """gModule stand-in: ordered `modules` list exactly as nngraph's
    gModule collects them (LookupTable, per layer i2h/h2h + elementwise
    glue, optional nested decoder_attn gModule)."""
    mods = []
    if lookup is not None:
        mods.append(_plain("nn.Identity"))
        mods.append(TorchObject("nn.LookupTable", {"weight": lookup}))
        mods.append(_plain("nn.JoinTable", dimension=2))
    for li, lw in enumerate(layers, start=1):
        prefix = f"{model_name}_L{li}_"
        mods.append(_linear_obj(
            lw["i2h"], name=(prefix + "i2h-reuse") if tag_names else None))
        mods.append(_linear_obj(
            lw["h2h"], name=(prefix + "h2h-reuse") if tag_names else None))
        mods.append(_plain("nn.CAddTable"))
        mods.append(_plain("nn.Reshape"))
        mods.append(_plain("nn.SplitTable"))
        for g in range(4):
            mods.append(_plain("nn.Sigmoid" if g < 3 else "nn.Tanh"))
    if attn is not None:
        attn_mods = [
            _plain("nn.Identity"),
            _linear_obj({"weight": attn["w_a"]}, "nn.LinearNoBias"),
            _plain("nn.MM"), _plain("nn.Sum"), _plain("nn.SoftMax"),
            _plain("nn.Replicate"), _plain("nn.MM"), _plain("nn.Sum"),
            _plain("nn.JoinTable"),
            _linear_obj({"weight": attn["w_c"]}, "nn.LinearNoBias"),
            _plain("nn.Tanh"),
        ]
        attn_g = _plain("nn.gModule", modules=attn_mods)
        attn_g.fields["name"] = "decoder_attn"
        mods.append(attn_g)
    return _plain("nn.gModule", modules=mods)


def save_reference_checkpoint(path: str, w: Dict, *, enc_h: int, emb: int,
                              vocab: int, input_feed: bool = True,
                              tag_names: bool = True,
                              global_step: int = 0,
                              learning_rate: float = 0.1) -> None:
    cnn = build_cnn_sequential(w)
    enc_fw = build_lstm_gmodule(w["encoder_fw"], "encoder-fw", tag_names)
    enc_bw = build_lstm_gmodule(w["encoder_bw"], "encoder-bw", tag_names)
    dec = build_lstm_gmodule(
        w["decoder"]["layers"], "decoder", tag_names,
        lookup=w["decoder"]["embedding"],
        attn={"w_a": w["decoder"]["w_a"], "w_c": w["decoder"]["w_c"]},
    )
    proj = _plain("nn.Sequential", modules=[
        _linear_obj(w["projector"]), _plain("nn.LogSoftMax")])
    config = {
        "dropout": 0.0,
        "encoder_num_hidden": enc_h,
        "encoder_num_layers": 1,
        "decoder_num_layers": len(w["decoder"]["layers"]),
        "target_vocab_size": vocab,
        "target_embedding_size": emb,
        "input_feed": input_feed,
        "max_encoder_l": 80,
        "max_decoder_l": 50,
        "batch_size": 4,
        "prealloc": tag_names,
    }
    optim_state = {"learningRate": learning_rate, "evalCounter": global_step}
    t7.save(path, [[cnn, enc_fw, enc_bw, dec, proj], config,
                   float(global_step), optim_state])
