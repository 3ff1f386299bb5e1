"""Rule-table compilation tests against hand-derived facts from data.yaml."""

import numpy as np

from crafter_tpu import rules


def test_enumeration_sizes():
  assert rules.N_ACTIONS == 17          # data.yaml:1-18
  assert len(rules.MATERIALS) == 12     # data.yaml:20-32
  assert rules.N_ITEMS == 16            # data.yaml:39-55
  assert rules.N_ACHIEVEMENTS == 22     # data.yaml:80-102


def test_walkable_masks():
  t = rules.TABLES
  # data.yaml:34-37: grass, path, sand.
  assert t.walkable_mob[[rules.MAT_GRASS, rules.MAT_PATH, rules.MAT_SAND]].all()
  assert t.walkable_mob.sum() == 3
  # Player additionally walks on lava (objects.py:96-97).
  assert t.walkable_player[rules.MAT_LAVA]
  assert t.walkable_player.sum() == 4
  # Arrows fly over water and lava (objects.py:369-371).
  assert t.walkable_arrow[rules.MAT_WATER] and t.walkable_arrow[rules.MAT_LAVA]
  assert t.walkable_arrow.sum() == 5
  assert not t.walkable_mob[rules.MAT_NONE]


def test_collect_tables():
  t = rules.TABLES
  # tree: no requirement, +1 wood, leaves grass, p=1 (data.yaml:58).
  assert t.collectible[rules.MAT_TREE]
  assert t.collect_require[rules.MAT_TREE].sum() == 0
  assert t.collect_receive[rules.MAT_TREE, rules.ITEM_ID['wood']] == 1
  assert t.collect_leaves[rules.MAT_TREE] == rules.MAT_GRASS
  assert t.collect_prob[rules.MAT_TREE] == 1.0
  assert t.collect_ach[rules.MAT_TREE] == rules.ACH_ID['collect_wood']
  # diamond requires iron pickaxe (data.yaml:62).
  assert t.collect_require[
      rules.MAT_DIAMOND, rules.ITEM_ID['iron_pickaxe']] == 1
  assert t.collect_leaves[rules.MAT_DIAMOND] == rules.MAT_PATH
  # grass → sapling at p=0.1 (data.yaml:64).
  assert np.isclose(t.collect_prob[rules.MAT_GRASS], 0.1)
  # water leaves water and gives drink (data.yaml:63).
  assert t.collect_leaves[rules.MAT_WATER] == rules.MAT_WATER
  assert t.collect_receive[rules.MAT_WATER, rules.ITEM_DRINK] == 1
  assert t.collect_ach[rules.MAT_WATER] == rules.ACH_ID['collect_drink']
  # Non-collectible materials: table, furnace, lava, path, sand.
  for mat in [rules.MAT_TABLE, rules.MAT_FURNACE, rules.MAT_LAVA,
              rules.MAT_PATH, rules.MAT_SAND, rules.MAT_NONE]:
    assert not t.collectible[mat]


def test_place_tables():
  t = rules.TABLES
  i = rules.PLACE_NAMES.index('stone')
  # stone placeable on grass/sand/path/water/lava, costs 1 stone
  # (data.yaml:67).
  assert t.place_uses[i, rules.ITEM_ID['stone']] == 1
  assert t.place_where[i, [rules.MAT_GRASS, rules.MAT_SAND, rules.MAT_PATH,
                           rules.MAT_WATER, rules.MAT_LAVA]].all()
  assert t.place_where[i].sum() == 5
  assert t.place_is_material[i] and t.place_material[i] == rules.MAT_STONE
  # furnace costs 4 stone (data.yaml:69).
  j = rules.PLACE_NAMES.index('furnace')
  assert t.place_uses[j, rules.ITEM_ID['stone']] == 4
  # plant is an object placement on grass only (data.yaml:70).
  k = rules.PLACE_NAMES.index('plant')
  assert not t.place_is_material[k]
  assert t.place_entity[k] == rules.E_PLANT
  assert t.place_where[k].sum() == 1 and t.place_where[k, rules.MAT_GRASS]
  assert t.place_ach[k] == rules.ACH_ID['place_plant']


def test_make_tables():
  t = rules.TABLES
  i = rules.MAKE_NAMES.index('iron_pickaxe')
  # iron_pickaxe: wood+coal+iron, needs table AND furnace (data.yaml:75).
  for item in ['wood', 'coal', 'iron']:
    assert t.make_uses[i, rules.ITEM_ID[item]] == 1
  assert t.make_nearby[i, rules.MAT_TABLE]
  assert t.make_nearby[i, rules.MAT_FURNACE]
  assert t.make_gives_item[i] == rules.ITEM_ID['iron_pickaxe']
  assert t.make_gives_count[i] == 1
  assert t.make_ach[i] == rules.ACH_ID['make_iron_pickaxe']
  # wood_sword needs only a table (data.yaml:76).
  j = rules.MAKE_NAMES.index('wood_sword')
  assert t.make_nearby[j].sum() == 1 and t.make_nearby[j, rules.MAT_TABLE]


def test_item_initials():
  t = rules.TABLES
  # health/food/drink/energy start at 9, everything else at 0
  # (data.yaml:40-55).
  assert (t.item_initial[:4] == 9).all()
  assert (t.item_initial[4:] == 0).all()
  assert (t.item_max == 9).all()


def test_action_order_matches_place_make_tables():
  # Actions 7..10 are the four places, 11..16 the six makes (data.yaml:9-18).
  for i, name in enumerate(rules.PLACE_NAMES):
    assert rules.ACTION_ID[f'place_{name}'] == 7 + i
  for i, name in enumerate(rules.MAKE_NAMES):
    assert rules.ACTION_ID[f'make_{name}'] == 11 + i


def test_override_rules_roundtrip():
  from crafter_tpu import rules
  try:
    t = rules.override_rules(lambda r: r['items']['health'].update(
        max=5, initial=5))
    assert t.item_max[rules.ITEM_HEALTH] == 5
    assert rules.TABLES.item_initial[rules.ITEM_HEALTH] == 5
  finally:
    rules.override_rules(lambda r: None)
  assert rules.TABLES.item_max[rules.ITEM_HEALTH] == 9
