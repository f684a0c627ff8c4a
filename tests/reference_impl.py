"""Independent float64 numpy reference for RWKV v4/v5/v6/v7.

Deliberately written in the most literal per-token / per-layer / per-head
loop style (no batching, no chunking, no masking) so that bugs in the JAX
implementations' vectorization, scanning and masking are caught by
comparison.  Operates on the raw math-oriented weight dict from
``ai00_server_tpu.testing.make_raw_weights``.
"""

import numpy as np


def ln(x, w, b, eps=1e-5):
    mean = x.mean()
    var = x.var()
    return (x - mean) / np.sqrt(var + eps) * w + b


def gn(x, num_groups, w, b, eps=64e-5):
    C = x.shape[0]
    g = x.reshape(num_groups, C // num_groups)
    mean = g.mean(-1, keepdims=True)
    var = g.var(-1, keepdims=True)
    y = ((g - mean) / np.sqrt(var + eps)).reshape(C)
    return y * w + b


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def silu(x):
    return x * sigmoid(x)


def v5_forward_ref(raw, info, tokens):
    """RWKV v5.2 reference.  Returns (hidden (T, C), state dict) in f64."""
    C, L = info.num_emb, info.num_layer
    H, N = info.num_head, info.head_size

    att_x = [np.zeros(C) for _ in range(L)]
    ffn_x = [np.zeros(C) for _ in range(L)]
    S = [np.zeros((H, N, N)) for _ in range(L)]  # (k-dim, v-dim)

    hiddens = []
    for tok in tokens:
        x = raw["emb.weight"][tok].astype(np.float64)
        x = ln(x, raw["blocks.0.ln0.weight"], raw["blocks.0.ln0.bias"])
        for i in range(L):
            b = f"blocks.{i}."
            a = b + "att."
            f = b + "ffn."

            xx = ln(x, raw[b + "ln1.weight"], raw[b + "ln1.bias"])
            xk = xx * raw[a + "time_mix_k"] + att_x[i] * (1 - raw[a + "time_mix_k"])
            xv = xx * raw[a + "time_mix_v"] + att_x[i] * (1 - raw[a + "time_mix_v"])
            xr = xx * raw[a + "time_mix_r"] + att_x[i] * (1 - raw[a + "time_mix_r"])
            xg = xx * raw[a + "time_mix_g"] + att_x[i] * (1 - raw[a + "time_mix_g"])
            att_x[i] = xx

            r = (xr @ raw[a + "receptance.weight"]).reshape(H, N)
            k = (xk @ raw[a + "key.weight"]).reshape(H, N)
            v = (xv @ raw[a + "value.weight"]).reshape(H, N)
            g = silu(xg @ raw[a + "gate.weight"])
            w = np.exp(-np.exp(raw[a + "time_decay"]))  # (H, N)
            u = raw[a + "time_first"]  # (H, N)

            y = np.zeros((H, N))
            for h in range(H):
                kv = np.outer(k[h], v[h])  # (N_k, N_v)
                y[h] = r[h] @ (S[i][h] + u[h][:, None] * kv)
                S[i][h] = w[h][:, None] * S[i][h] + kv

            y = gn(y.reshape(C), H, raw[a + "ln_x.weight"], raw[a + "ln_x.bias"])
            x = x + (y * g) @ raw[a + "output.weight"]

            xx = ln(x, raw[b + "ln2.weight"], raw[b + "ln2.bias"])
            xkf = xx * raw[f + "time_mix_k"] + ffn_x[i] * (1 - raw[f + "time_mix_k"])
            xrf = xx * raw[f + "time_mix_r"] + ffn_x[i] * (1 - raw[f + "time_mix_r"])
            ffn_x[i] = xx
            kf = np.square(np.maximum(xkf @ raw[f + "key.weight"], 0.0))
            rf = sigmoid(xrf @ raw[f + "receptance.weight"])
            x = x + rf * (kf @ raw[f + "value.weight"])

        hiddens.append(ln(x, raw["ln_out.weight"], raw["ln_out.bias"]))

    state = {
        "att_x": np.stack(att_x)[:, None],
        "wkv": np.stack(S)[:, None],
        "ffn_x": np.stack(ffn_x)[:, None],
    }
    return np.stack(hiddens), state


def v6_forward_ref(raw, info, tokens):
    """RWKV v6 reference.  Returns (hidden (T, C), state dict) in f64."""
    C, L = info.num_emb, info.num_layer
    H, N = info.num_head, info.head_size

    att_x = [np.zeros(C) for _ in range(L)]
    ffn_x = [np.zeros(C) for _ in range(L)]
    S = [np.zeros((H, N, N)) for _ in range(L)]  # (k-dim, v-dim)

    hiddens = []
    for tok in tokens:
        x = raw["emb.weight"][tok].astype(np.float64)
        x = ln(x, raw["blocks.0.ln0.weight"], raw["blocks.0.ln0.bias"])
        for i in range(L):
            b = f"blocks.{i}."
            a = b + "att."
            f = b + "ffn."

            xx = ln(x, raw[b + "ln1.weight"], raw[b + "ln1.bias"])
            dx = att_x[i] - xx
            att_x[i] = xx

            xxx = xx + dx * raw[a + "time_mix_x"]
            D = raw[a + "time_mix_w1"].shape[1] // 5
            hbuf = np.tanh(xxx @ raw[a + "time_mix_w1"]).reshape(5, D)
            m = np.stack([hbuf[j] @ raw[a + "time_mix_w2"][j] for j in range(5)])
            mw, mk, mv, mr, mg = m

            xw = xx + dx * (raw[a + "time_mix_w"] + mw)
            xk = xx + dx * (raw[a + "time_mix_k"] + mk)
            xv = xx + dx * (raw[a + "time_mix_v"] + mv)
            xr = xx + dx * (raw[a + "time_mix_r"] + mr)
            xg = xx + dx * (raw[a + "time_mix_g"] + mg)

            r = (xr @ raw[a + "receptance.weight"]).reshape(H, N)
            k = (xk @ raw[a + "key.weight"]).reshape(H, N)
            v = (xv @ raw[a + "value.weight"]).reshape(H, N)
            g = silu(xg @ raw[a + "gate.weight"])
            ww = raw[a + "time_decay"] + np.tanh(
                xw @ raw[a + "time_decay_w1"]
            ) @ raw[a + "time_decay_w2"]
            w = np.exp(-np.exp(ww)).reshape(H, N)
            u = raw[a + "time_first"]

            y = np.zeros((H, N))
            for h in range(H):
                kv = np.outer(k[h], v[h])
                y[h] = r[h] @ (S[i][h] + u[h][:, None] * kv)
                S[i][h] = w[h][:, None] * S[i][h] + kv

            y = gn(y.reshape(C), H, raw[a + "ln_x.weight"], raw[a + "ln_x.bias"])
            x = x + (y * g) @ raw[a + "output.weight"]

            xx = ln(x, raw[b + "ln2.weight"], raw[b + "ln2.bias"])
            dxf = ffn_x[i] - xx
            ffn_x[i] = xx
            xkf = xx + dxf * raw[f + "time_mix_k"]
            xrf = xx + dxf * raw[f + "time_mix_r"]
            kf = np.square(np.maximum(xkf @ raw[f + "key.weight"], 0.0))
            rf = sigmoid(xrf @ raw[f + "receptance.weight"])
            x = x + rf * (kf @ raw[f + "value.weight"])

        hiddens.append(ln(x, raw["ln_out.weight"], raw["ln_out.bias"]))

    state = {
        "att_x": np.stack(att_x)[:, None],
        "wkv": np.stack(S)[:, None],
        "ffn_x": np.stack(ffn_x)[:, None],
    }
    return np.stack(hiddens), state


def v4_forward_ref(raw, info, tokens):
    """RWKV v4 reference.  Returns (hidden (T, C), state dict) in f64."""
    C, L = info.num_emb, info.num_layer

    att_x = [np.zeros(C) for _ in range(L)]
    ffn_x = [np.zeros(C) for _ in range(L)]
    aa = [np.zeros(C) for _ in range(L)]
    bb = [np.zeros(C) for _ in range(L)]
    pp = [np.full(C, -1e30) for _ in range(L)]

    hiddens = []
    for tok in tokens:
        x = raw["emb.weight"][tok].astype(np.float64)
        x = ln(x, raw["blocks.0.ln0.weight"], raw["blocks.0.ln0.bias"])
        for i in range(L):
            b = f"blocks.{i}."
            a = b + "att."
            f = b + "ffn."

            xx = ln(x, raw[b + "ln1.weight"], raw[b + "ln1.bias"])
            xk = xx * raw[a + "time_mix_k"] + att_x[i] * (1 - raw[a + "time_mix_k"])
            xv = xx * raw[a + "time_mix_v"] + att_x[i] * (1 - raw[a + "time_mix_v"])
            xr = xx * raw[a + "time_mix_r"] + att_x[i] * (1 - raw[a + "time_mix_r"])
            att_x[i] = xx

            r = sigmoid(xr @ raw[a + "receptance.weight"])
            k = xk @ raw[a + "key.weight"]
            v = xv @ raw[a + "value.weight"]
            w = -np.exp(raw[a + "time_decay"])
            u = raw[a + "time_first"]

            ww = u + k
            q = np.maximum(pp[i], ww)
            e1 = np.exp(pp[i] - q)
            e2 = np.exp(ww - q)
            wkv = (e1 * aa[i] + e2 * v) / (e1 * bb[i] + e2)

            ww = pp[i] + w
            q = np.maximum(ww, k)
            e1 = np.exp(ww - q)
            e2 = np.exp(k - q)
            aa[i] = e1 * aa[i] + e2 * v
            bb[i] = e1 * bb[i] + e2
            pp[i] = q

            x = x + (r * wkv) @ raw[a + "output.weight"]

            xx = ln(x, raw[b + "ln2.weight"], raw[b + "ln2.bias"])
            xkf = xx * raw[f + "time_mix_k"] + ffn_x[i] * (1 - raw[f + "time_mix_k"])
            xrf = xx * raw[f + "time_mix_r"] + ffn_x[i] * (1 - raw[f + "time_mix_r"])
            ffn_x[i] = xx
            kf = np.square(np.maximum(xkf @ raw[f + "key.weight"], 0.0))
            rf = sigmoid(xrf @ raw[f + "receptance.weight"])
            x = x + rf * (kf @ raw[f + "value.weight"])

        hiddens.append(ln(x, raw["ln_out.weight"], raw["ln_out.bias"]))

    state = {
        "att_x": np.stack(att_x)[:, None],
        "aa": np.stack(aa)[:, None],
        "bb": np.stack(bb)[:, None],
        "pp": np.stack(pp)[:, None],
        "ffn_x": np.stack(ffn_x)[:, None],
    }
    return np.stack(hiddens), state


def v7_forward_ref(raw, info, tokens):
    """Returns (hidden (T, C) post-ln_out, state dict) in float64."""
    C, L = info.num_emb, info.num_layer
    H, N = info.num_head, info.head_size

    att_x = [np.zeros(C) for _ in range(L)]
    ffn_x = [np.zeros(C) for _ in range(L)]
    S = [np.zeros((H, N, N)) for _ in range(L)]  # (v-dim, k-dim)

    hiddens = []
    for tok in tokens:
        x = raw["emb.weight"][tok].astype(np.float64)
        x = ln(x, raw["blocks.0.ln0.weight"], raw["blocks.0.ln0.bias"])
        v_first = None
        for i in range(L):
            b = f"blocks.{i}."
            a = b + "att."
            f = b + "ffn."

            # ---- time mix ----
            xx = ln(x, raw[b + "ln1.weight"], raw[b + "ln1.bias"])
            dx = att_x[i] - xx
            xr = xx + dx * raw[a + "x_r"]
            xw = xx + dx * raw[a + "x_w"]
            xk = xx + dx * raw[a + "x_k"]
            xv = xx + dx * raw[a + "x_v"]
            xa = xx + dx * raw[a + "x_a"]
            xg = xx + dx * raw[a + "x_g"]
            att_x[i] = xx

            r = xr @ raw[a + "receptance.weight"]
            k = xk @ raw[a + "key.weight"]
            v = xv @ raw[a + "value.weight"]
            w = np.exp(
                -np.exp(-0.5)
                * sigmoid(raw[a + "w0"] + np.tanh(xw @ raw[a + "w1"]) @ raw[a + "w2"])
            )
            aa = sigmoid(raw[a + "a0"] + (xa @ raw[a + "a1"]) @ raw[a + "a2"])
            g = sigmoid(xg @ raw[a + "g1"]) @ raw[a + "g2"]

            kk = (k * raw[a + "k_k"]).reshape(H, N)
            kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
            k = k * (1 + (aa - 1) * raw[a + "k_a"])

            if i == 0:
                v_first = v.copy()
            else:
                v = v + (v_first - v) * sigmoid(
                    raw[a + "v0"] + (xv @ raw[a + "v1"]) @ raw[a + "v2"]
                )

            rh = r.reshape(H, N)
            wh = w.reshape(H, N)
            kh = k.reshape(H, N)
            vh = v.reshape(H, N)
            ah = aa.reshape(H, N)

            y = np.zeros((H, N))
            for h in range(H):
                ab = np.outer(-kk[h], kk[h] * ah[h])  # (N_k, N_k)
                vk = np.outer(vh[h], kh[h])  # (N_v, N_k)
                S[i][h] = S[i][h] * wh[h][None, :] + S[i][h] @ ab + vk
                y[h] = S[i][h] @ rh[h]

            y = gn(y.reshape(C), H, raw[a + "ln_x.weight"], raw[a + "ln_x.bias"])
            bonus = ((rh * kh * raw[a + "r_k"]).sum(-1, keepdims=True) * vh).reshape(C)
            y = y + bonus
            x = x + (y * g) @ raw[a + "output.weight"]

            # ---- channel mix ----
            xx = ln(x, raw[b + "ln2.weight"], raw[b + "ln2.bias"])
            dxf = ffn_x[i] - xx
            xkf = xx + dxf * raw[f + "x_k"]
            ffn_x[i] = xx
            kf = np.square(np.maximum(xkf @ raw[f + "key.weight"], 0.0))
            x = x + kf @ raw[f + "value.weight"]

        hiddens.append(ln(x, raw["ln_out.weight"], raw["ln_out.bias"]))

    state = {
        "att_x": np.stack(att_x)[:, None],
        "wkv": np.stack(S)[:, None],
        "ffn_x": np.stack(ffn_x)[:, None],
    }
    return np.stack(hiddens), state
