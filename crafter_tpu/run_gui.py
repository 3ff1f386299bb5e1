"""Human-play pygame GUI (reference: crafter/run_gui.py:1-146).

Same keymap (WASD/SPACE/TAB, R/T/F/P for placing, 1-6 for crafting), fps
clock, `--death {continue,reset,quit}`, `--wait`, and `--record` flags.
The window is a thin client over the JAX env's single-env path.
"""

import argparse

import numpy as np


KEYMAP_NAMES = {
    'a': 'move_left', 'd': 'move_right', 'w': 'move_up', 's': 'move_down',
    'space': 'do', 'tab': 'sleep',
    'r': 'place_stone', 't': 'place_table', 'f': 'place_furnace',
    'p': 'place_plant',
    '1': 'make_wood_pickaxe', '2': 'make_stone_pickaxe',
    '3': 'make_iron_pickaxe', '4': 'make_wood_sword',
    '5': 'make_stone_sword', '6': 'make_iron_sword',
}



def _apply_platform_env():
  from crafter_tpu.utils import apply_platform_env
  apply_platform_env()

def main():
  _apply_platform_env()
  boolean = lambda x: bool(['False', 'True'].index(x))
  parser = argparse.ArgumentParser()
  parser.add_argument('--seed', type=int, default=None)
  parser.add_argument('--area', nargs=2, type=int, default=(64, 64))
  parser.add_argument('--view', type=int, nargs=2, default=(9, 9))
  parser.add_argument('--length', type=int, default=None)
  parser.add_argument('--health', type=int, default=9)
  parser.add_argument('--window', type=int, nargs=2, default=(600, 600))
  parser.add_argument('--size', type=int, nargs=2, default=(0, 0))
  parser.add_argument('--record', type=str, default=None)
  parser.add_argument('--fps', type=int, default=5)
  parser.add_argument('--wait', type=boolean, default=False)
  parser.add_argument('--death', type=str, default='reset',
                      choices=['continue', 'reset', 'quit'])
  args = parser.parse_args()

  try:
    import pygame
  except ImportError:
    print('Please install the pygame package to use the GUI.')
    raise

  import crafter_tpu
  from crafter_tpu import rules

  if args.health != 9:  # run_gui.py:55-56 health override
    rules.override_rules(lambda r: r['items']['health'].update(
        max=args.health, initial=args.health))

  keymap = {pygame.key.key_code(name): action
            for name, action in KEYMAP_NAMES.items()}
  print('Actions:')
  for key, action in keymap.items():
    print(f'  {pygame.key.name(key)}: {action}')

  size = list(args.size)
  size[0] = size[0] or args.window[0]
  size[1] = size[1] or args.window[1]

  env = crafter_tpu.Env(
      area=args.area, view=args.view, length=args.length or 10000,
      seed=args.seed)
  if args.record:
    env = crafter_tpu.Recorder(env, args.record)
  env.reset()
  achievements = set()
  duration = 0
  return_ = 0
  was_done = False

  pygame.init()
  screen = pygame.display.set_mode(args.window)
  clock = pygame.time.Clock()
  running = True
  while running:
    # Rendering.
    image = env.render(size)
    if size != args.window:
      from PIL import Image
      image = Image.fromarray(image)
      image = image.resize(args.window, resample=Image.NEAREST)
      image = np.array(image)
    surface = pygame.surfarray.make_surface(image.transpose((1, 0, 2)))
    screen.blit(surface, (0, 0))
    pygame.display.flip()
    clock.tick(args.fps)

    # Keyboard input.
    action = None
    pygame.event.pump()
    for event in pygame.event.get():
      if event.type == pygame.QUIT:
        running = False
      elif event.type == pygame.KEYDOWN and event.key == pygame.K_ESCAPE:
        running = False
      elif event.type == pygame.KEYDOWN and event.key in keymap.keys():
        action = keymap[event.key]
    if action is None:
      pressed = pygame.key.get_pressed()
      for key, action_ in keymap.items():
        if pressed[key]:
          action = action_
          break
    if args.wait and action is None:
      continue
    action = action or 'noop'

    # Environment step.
    _, reward, done, info = env.step(env.action_names.index(action))
    duration += 1

    # Achievement printout (run_gui.py:114-127).
    unlocked = {
        name for name, count in info['achievements'].items()
        if count > 0 and name not in achievements}
    for name in unlocked:
      achievements |= unlocked
      total = len(info['achievements'].keys())
      print(f'Achievement ({len(achievements)}/{total}): {name}')
    if info['discount'] < 1:
      print(f'Lost all health.')
    return_ += reward

    # Death handling (run_gui.py:129-144).
    if done and not was_done:
      was_done = True
      print('Episode done!')
      print(f'Duration: {duration}')
      print(f'Return: {return_:.1f}')
      if args.death == 'quit':
        running = False
      if args.death == 'reset':
        print('\nStarting a new episode.')
        env.reset()
        achievements = set()
        was_done = False
        duration = 0
        return_ = 0
      if args.death == 'continue':
        pass

  pygame.quit()


if __name__ == '__main__':
  main()
