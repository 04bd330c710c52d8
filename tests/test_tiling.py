import numpy as np
import pytest

from deep_image_matching_tpu.utils.tiling import Tiler


@pytest.fixture
def tiler():
    return Tiler()


def test_tiles_no_overlap_no_padding(tiler):
    img = np.random.randint(0, 255, (100, 100, 3), dtype=np.uint8)
    tiles, origins, padding = tiler.compute_tiles_by_size(img, 50, 0)
    assert len(tiles) == 4
    assert padding == (0, 0, 0, 0)
    for t in tiles.values():
        assert t.shape == (50, 50, 3)
    assert origins[0] == (0, 0)
    assert origins[3] == (50, 50)


def test_tiles_no_overlap_padding(tiler):
    img = np.random.randint(0, 255, (100, 100, 3), dtype=np.uint8)
    tiles, origins, padding = tiler.compute_tiles_by_size(img, 40, 0)
    assert len(tiles) == 9
    assert padding == (10, 10, 10, 10)
    assert origins[0] == (-10, -10)


def test_tiles_overlap(tiler):
    img = np.random.randint(0, 255, (100, 100), dtype=np.uint8)
    tiles, origins, padding = tiler.compute_tiles_by_size(img, 50, 10)
    # stride 40, padded size 100: positions 0 and 40 and ... (100-50)/40+1 = 2
    assert len(tiles) == 4
    for t in tiles.values():
        assert t.shape == (50, 50)


def test_tile_reconstruction_roundtrip(tiler):
    """A keypoint found in a tile maps back to the right image pixel."""
    img = np.arange(100 * 120, dtype=np.float32).reshape(100, 120)
    tiles_arr, origins, _ = tiler.compute_tiles_array(img, (60, 50), 0)
    for i in range(len(tiles_arr)):
        x0, y0 = origins[i]
        # probe the tile center
        ty, tx = 25, 30
        gx, gy = tx + x0, ty + y0
        if 0 <= gx < 120 and 0 <= gy < 100:
            assert tiles_arr[i][ty, tx] == img[gy, gx]


def test_tiles_by_grid(tiler):
    img = np.random.randint(0, 255, (90, 120), dtype=np.uint8)
    tiles, origins, _ = tiler.compute_tiles_by_grid(img, (3, 2), 0)
    assert len(tiles) == 6


def test_overlap_must_be_smaller_than_window(tiler):
    img = np.zeros((64, 64), np.uint8)
    with pytest.raises(ValueError):
        tiler.compute_tiles_by_size(img, 32, 32)
