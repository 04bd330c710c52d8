import torch
import torch.nn.functional as F


def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                  padding=(0, 0), dilation=(1, 1), mask=None):
    """Pure-torch deformable conv v2 (matches torchvision.ops.deform_conv2d).

    offset layout: (B, 2*kh*kw, H, W) with per-kernel-position (dy, dx) pairs.
    """
    if isinstance(stride, int): stride = (stride, stride)
    if isinstance(padding, int): padding = (padding, padding)
    if isinstance(dilation, int): dilation = (dilation, dilation)
    B, Cin, H, W = input.shape
    Cout, Cin_g, kh, kw = weight.shape
    sh, sw = stride; ph, pw = padding; dh, dw = dilation
    Ho = (H + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    Wo = (W + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    # base sampling grid per kernel position
    ys = torch.arange(Ho, dtype=input.dtype) * sh - ph
    xs = torch.arange(Wo, dtype=input.dtype) * sw - pw
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")  # (Ho, Wo)
    cols = []
    off = offset.view(B, kh * kw, 2, Ho, Wo)
    msk = mask.view(B, kh * kw, Ho, Wo) if mask is not None else None
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            py = gy[None] + i * dh + off[:, k, 0]  # (B, Ho, Wo)
            px = gx[None] + j * dw + off[:, k, 1]
            # bilinear sample with zero padding outside
            gx_n = 2 * px / max(W - 1, 1) - 1
            gy_n = 2 * py / max(H - 1, 1) - 1
            grid = torch.stack([gx_n, gy_n], dim=-1)  # (B, Ho, Wo, 2)
            v = F.grid_sample(input, grid, mode="bilinear",
                              padding_mode="zeros", align_corners=True)
            if msk is not None:
                v = v * msk[:, k][:, None]
            cols.append(v)  # (B, Cin, Ho, Wo)
    col = torch.stack(cols, dim=2)  # (B, Cin, kh*kw, Ho, Wo)
    col = col.view(B, Cin * kh * kw, Ho * Wo)
    w = weight.view(Cout, Cin_g * kh * kw)
    out = (w @ col).view(B, Cout, Ho, Wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out
