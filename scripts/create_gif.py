#!/usr/bin/env python
"""Animated GIF of per-epoch branch-score heatmaps (docs asset).

Working replacement for /root/reference/src/scripts/create_gif.py (which
shells out to OpenCV + ImageMagick): pairs the per-epoch ASR and VSR heatmap
images exported by scripts/study_branches.py, stitches each pair side by
side with an "ASR/VSR -- Epoch N" caption, holds the final frame, and writes
one looping GIF with PIL — no external binaries.

Usage:
  python scripts/create_gif.py ASR_IMAGE_DIR VSR_IMAGE_DIR OUT.gif
  python scripts/create_gif.py --images epoch_*.png --output OUT.gif
"""

import _pathfix  # noqa: F401  (repo path + JAX_PLATFORMS override)

import argparse
import os
import re
import sys


def _epoch_of(path: str) -> str:
    # reference convention: ".../heatmap_epoch7.png" -> "7"
    m = re.search(r"epoch[_-]?(\d+)", os.path.basename(path))
    return m.group(1) if m else ""


def _caption(img, text: str):
    from PIL import ImageDraw

    draw = ImageDraw.Draw(img)
    # outline for legibility on any heatmap background
    x, y = 12, 8
    for dx in (-1, 1):
        for dy in (-1, 1):
            draw.text((x + dx, y + dy), text, fill=(255, 255, 255))
    draw.text((x, y), text, fill=(0, 0, 0))
    return img


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dirs", nargs="*",
                   help="ASR_IMAGE_DIR VSR_IMAGE_DIR OUT.gif (reference CLI)")
    p.add_argument("--images", nargs="*", default=[],
                   help="explicit ordered frame images (single-stream mode)")
    p.add_argument("--output", default="")
    p.add_argument("--delay-ms", type=int, default=300,
                   help="per-frame delay (reference: convert -delay 30)")
    p.add_argument("--hold-frames", type=int, default=10,
                   help="extra copies of the final frame (reference behavior)")
    args = p.parse_args(argv)

    from PIL import Image

    frames = []
    if args.images:
        out = args.output or "branch_scores.gif"
        for f in args.images:
            img = Image.open(f).convert("RGB")
            ep = _epoch_of(f)
            frames.append(_caption(img, f"Epoch {ep}" if ep else ""))
    else:
        if len(args.dirs) != 3:
            p.error("expected ASR_IMAGE_DIR VSR_IMAGE_DIR OUT.gif "
                    "(or use --images/--output)")
        asr_dir, vsr_dir, out = args.dirs

        def image_files(d):
            # numeric epoch order (lexicographic puts epoch10 before epoch2)
            names = [f for f in os.listdir(d)
                     if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))]
            return sorted(names, key=lambda f: (int(_epoch_of(f) or 0), f))

        asr_files = image_files(asr_dir)
        vsr_files = image_files(vsr_dir)
        if not asr_files or not vsr_files:
            print("no images found", file=sys.stderr)
            return 1
        for af, vf in zip(asr_files, vsr_files):
            a = Image.open(os.path.join(asr_dir, af)).convert("RGB")
            v = Image.open(os.path.join(vsr_dir, vf)).convert("RGB")
            ep = _epoch_of(af)
            a = _caption(a, f"ASR -- Epoch {ep}")
            v = _caption(v, f"VSR -- Epoch {ep}")
            h = max(a.height, v.height)
            pair = Image.new("RGB", (a.width + v.width, h), (255, 255, 255))
            pair.paste(a, (0, 0))
            pair.paste(v, (a.width, 0))
            frames.append(pair)

    frames += [frames[-1]] * args.hold_frames
    frames[0].save(
        out, save_all=True, append_images=frames[1:],
        duration=args.delay_ms, loop=0,
    )
    print(f"wrote {out} ({len(frames)} frames)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
