"""Independent PyTorch (CPU, float64) implementation of the reference
forward pass, driven by torch-layout weights (tests/torch_fixture.py).

This is a from-the-Lua-spec reimplementation of:
- the CNN stack (cnn.lua:9-45): (x-128)/128, convs/BN(eval)/ReLU, pools
  (kW,kH) = (2,2),(2,2),(1,2),(1,2), final view/transpose to (B, L, 512)
- the bidirectional encoder (model.lua:294-316): fused [i|f|o|g] gates
- decoder init from encoder finals (model.lua:539-552): layer 1 =
  cat(fw final, bw state after t=1), deeper layers zero, input feed zero
- the input-feeding attention decoder cell (LSTM.lua:18-162): embedding,
  [emb ; h_tilde] join, stacked LSTM, Luong-general attention
  (scores = context . W_a h_top, h~ = tanh(W_c [ctx ; h_top]))
- projector + log-softmax, greedy argmax with the PAD/EOS freeze
  (model.lua:448-449)

Because it shares only the *weights* with the JAX implementation (not the
code), agreement on activations and transcripts is genuine cross-framework
evidence that the torch_import mapping and the JAX model reproduce the
reference math.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import torch
import torch.nn.functional as F

from aocr import vocab
from aocr.models.cnn import _CONV_DEFS, _POOL_AFTER, BN_EPS

DT = torch.float64


def _t(x) -> torch.Tensor:
    return torch.as_tensor(np.asarray(x), dtype=DT)


def cnn_forward(w: Dict, images: np.ndarray) -> torch.Tensor:
    """images (B, 32, W, 1) [0,255] -> column features (B, L, 512)."""
    x = _t(images).permute(0, 3, 1, 2)  # NHWC -> NCHW
    x = (x - 128.0) / 128.0
    for idx, (name, _i, _o, _kh, _kw, pad, bn) in enumerate(_CONV_DEFS):
        cw = w["cnn"][name]
        x = F.conv2d(x, _t(cw["weight"]), _t(cw["bias"]),
                     padding=1 if pad == "SAME" else 0)
        if bn:
            b = w["bn"][name]
            x = F.batch_norm(x, _t(b["running_mean"]), _t(b["running_var"]),
                             _t(b["weight"]), _t(b["bias"]),
                             training=False, eps=BN_EPS)
        x = F.relu(x)
        if idx in _POOL_AFTER:
            ph, pw = _POOL_AFTER[idx]  # (h, w) window == torch (kH, kW)
            x = F.max_pool2d(x, kernel_size=(ph, pw), stride=(ph, pw))
    # (B, 512, 1, L) -> (B, L, 512)
    return x.squeeze(2).permute(0, 2, 1)


def lstm_cell(lw: Dict, x: torch.Tensor, c: torch.Tensor, h: torch.Tensor
              ) -> Tuple[torch.Tensor, torch.Tensor]:
    """Fused-gate cell, [i|f|o|g] order (LSTM.lua:90-105)."""
    gates = (x @ _t(lw["i2h"]["weight"]).T + _t(lw["i2h"]["bias"])
             + h @ _t(lw["h2h"]["weight"]).T + _t(lw["h2h"]["bias"]))
    H = c.shape[-1]
    i, f, o, g = gates.split(H, dim=-1)
    i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
    g = torch.tanh(g)
    c2 = f * c + i * g
    return c2, o * torch.tanh(c2)


def encode(w: Dict, images: np.ndarray, enc_h: int):
    """-> (context (B, L, 2H), (c0, h0) decoder layer-1 init)."""
    feats = cnn_forward(w, images)  # (B, L, 512)
    B, L, _ = feats.shape
    fw, bw = w["encoder_fw"][0], w["encoder_bw"][0]
    z = torch.zeros(B, enc_h, dtype=DT)
    hs_fw: List[torch.Tensor] = []
    c, h = z, z
    for t in range(L):
        c, h = lstm_cell(fw, feats[:, t], c, h)
        hs_fw.append(h)
    c_fw_final, h_fw_final = c, h
    hs_bw = [None] * L
    c, h = z, z
    for t in reversed(range(L)):
        c, h = lstm_cell(bw, feats[:, t], c, h)
        hs_bw[t] = h
    c_bw_final, h_bw_final = c, h  # state after consuming t=0
    context = torch.stack(
        [torch.cat([hs_fw[t], hs_bw[t]], dim=-1) for t in range(L)], dim=1
    )
    c0 = torch.cat([c_fw_final, c_bw_final], dim=-1)
    h0 = torch.cat([h_fw_final, h_bw_final], dim=-1)
    return feats, context, (c0, h0)


def attention(dec: Dict, h_top: torch.Tensor, context: torch.Tensor
              ) -> Tuple[torch.Tensor, torch.Tensor]:
    q = h_top @ _t(dec["w_a"]).T  # LinearNoBias (H,H)
    scores = torch.einsum("blh,bh->bl", context, q)
    alpha = torch.softmax(scores, dim=-1)
    ctx = torch.einsum("bl,blh->bh", alpha, context)
    h_tilde = torch.tanh(
        torch.cat([ctx, h_top], dim=-1) @ _t(dec["w_c"]).T)
    return h_tilde, alpha


def greedy_decode(w: Dict, images: np.ndarray, enc_h: int, max_len: int,
                  input_feed: bool = True):
    """-> (transcript token rows (B, max_len), per-step log-prob list,
    first-step alpha (B, L))."""
    dec = w["decoder"]
    dec_h = 2 * enc_h
    _feats, context, (c0, h0) = encode(w, images, enc_h)
    B = context.shape[0]
    n_layers = len(dec["layers"])
    cs = [c0] + [torch.zeros(B, dec_h, dtype=DT)] * (n_layers - 1)
    hs = [h0] + [torch.zeros(B, dec_h, dtype=DT)] * (n_layers - 1)
    attn_vec = torch.zeros(B, dec_h, dtype=DT)
    emb_w = _t(dec["embedding"])
    proj_w, proj_b = _t(w["projector"]["weight"]), _t(w["projector"]["bias"])
    tokens = torch.full((B,), vocab.GO, dtype=torch.long)
    out_rows = np.full((B, max_len), vocab.PAD, np.int32)
    logps = []
    alpha0 = None
    for t in range(max_len):
        x = emb_w[tokens]
        if input_feed:
            x = torch.cat([x, attn_vec], dim=-1)
        for li in range(n_layers):
            cs[li], hs[li] = lstm_cell(dec["layers"][li], x, cs[li], hs[li])
            x = hs[li]
        h_tilde, alpha = attention(dec, hs[-1], context)
        if t == 0:
            alpha0 = alpha
        attn_vec = h_tilde
        logp = torch.log_softmax(h_tilde @ proj_w.T + proj_b, dim=-1)
        if t > 0:
            frozen = ((tokens == vocab.PAD) | (tokens == vocab.EOS))
            logp = logp.clone()
            logp[frozen, vocab.PAD] = 0.0  # freeze (model.lua:448-449)
        nxt = logp.argmax(dim=-1)
        logps.append(logp)
        tokens = nxt
        out_rows[:, t] = nxt.numpy()
    return out_rows, logps, alpha0


def teacher_forced_logprobs(w: Dict, images: np.ndarray, targets: np.ndarray,
                            enc_h: int, input_feed: bool = True
                            ) -> torch.Tensor:
    """Teacher-forced log-probs (B, T, V) — mirrors model.forward_loss."""
    dec = w["decoder"]
    dec_h = 2 * enc_h
    _f, context, (c0, h0) = encode(w, images, enc_h)
    B, T = targets.shape
    n_layers = len(dec["layers"])
    cs = [c0] + [torch.zeros(B, dec_h, dtype=DT)] * (n_layers - 1)
    hs = [h0] + [torch.zeros(B, dec_h, dtype=DT)] * (n_layers - 1)
    attn_vec = torch.zeros(B, dec_h, dtype=DT)
    emb_w = _t(dec["embedding"])
    proj_w, proj_b = _t(w["projector"]["weight"]), _t(w["projector"]["bias"])
    outs = []
    for t in range(T):
        x = emb_w[torch.as_tensor(targets[:, t], dtype=torch.long)]
        if input_feed:
            x = torch.cat([x, attn_vec], dim=-1)
        for li in range(n_layers):
            cs[li], hs[li] = lstm_cell(dec["layers"][li], x, cs[li], hs[li])
            x = hs[li]
        h_tilde, _ = attention(dec, hs[-1], context)
        attn_vec = h_tilde
        outs.append(torch.log_softmax(h_tilde @ proj_w.T + proj_b, dim=-1))
    return torch.stack(outs, dim=1)
