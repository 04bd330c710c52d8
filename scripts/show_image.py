"""Display one image with OpenCV or Pillow.

Equivalent of reference ``scripts/show_image.py``.

Usage:
    python scripts/show_image.py image.jpg [--lib opencv|pillow]
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("image_path", type=str)
    ap.add_argument("--lib", choices=["opencv", "pillow"], default="opencv")
    args = ap.parse_args()

    if args.lib == "opencv":
        import cv2

        image = cv2.imread(args.image_path)
        if image is None:
            print("Failed to load the image")
            return
        cv2.imshow("Image", image)
        cv2.waitKey(0)
        cv2.destroyAllWindows()
    else:
        from PIL import Image

        Image.open(args.image_path).show()


if __name__ == "__main__":
    main()
