def grayscale_to_rgb(x):
    return x.repeat(1, 3, 1, 1) if x.shape[1] == 1 else x

def rgb_to_grayscale(x):
    import torch
    if x.shape[1] == 1:
        return x
    w = torch.tensor([0.299, 0.587, 0.114], dtype=x.dtype).view(1, 3, 1, 1)
    return (x * w).sum(1, keepdim=True)
