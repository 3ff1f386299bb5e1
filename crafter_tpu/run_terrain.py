"""Whole-map terrain dumps (reference: crafter/run_terrain.py:1-43).

Renders `--amount` full worlds with area-sized view into one PNG grid for
visual worldgen inspection.
"""

import argparse

import numpy as np



def _apply_platform_env():
  from crafter_tpu.utils import apply_platform_env
  apply_platform_env()

def main():
  _apply_platform_env()
  parser = argparse.ArgumentParser()
  parser.add_argument('--amount', type=int, default=4)
  parser.add_argument('--cols', type=int, default=4)
  parser.add_argument('--area', nargs=2, type=int, default=(64, 64))
  parser.add_argument('--size', type=int, default=1024)
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--filename', type=str, default='terrain.png')
  args = parser.parse_args()

  import imageio.v3 as iio
  import crafter_tpu

  # View the whole area at once: view == area (run_terrain.py:21-24).
  images = []
  for i in range(args.amount):
    env = crafter_tpu.Env(
        area=args.area, view=args.area,
        size=(args.size, args.size), seed=args.seed + i)
    images.append(env.reset())
  cols = min(args.cols, len(images))
  rows = int(np.ceil(len(images) / cols))
  grid = np.zeros((rows * args.size, cols * args.size, 3), np.uint8)
  for i, image in enumerate(images):
    r, c = divmod(i, cols)
    grid[r * args.size:(r + 1) * args.size,
         c * args.size:(c + 1) * args.size] = image
  iio.imwrite(args.filename, grid)
  print('Saved', args.filename)


if __name__ == '__main__':
  main()
