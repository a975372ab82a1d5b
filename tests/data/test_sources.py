import gzip
import textwrap

import numpy as np
import pytest

from lkpy_tpu.data.sources import load_amazon_ratings, load_ms_web, load_steam


def test_amazon_2014(tmp_path):
    f = tmp_path / "ratings.csv"
    f.write_text("A1USER,B000123456,5.0,1400000000\nA2USER,B000123457,3.0,1400000100\n")
    ds = load_amazon_ratings(f)
    assert ds.user_count == 2
    assert ds.item_count == 2
    assert ds.interaction_count == 2


def test_amazon_2018(tmp_path):
    f = tmp_path / "ratings.csv"
    f.write_text("B000123456,u1,5.0,1400000000\nB000123457,u2,3.0,1400000100\n")
    ds = load_amazon_ratings(f)
    assert ds.item_count == 2
    assert sorted(ds.items.ids.tolist()) == ["B000123456", "B000123457"]


def test_amazon_2023(tmp_path):
    f = tmp_path / "ratings.csv"
    f.write_text("user_id,parent_asin,rating,timestamp\nu1,B0001,4.0,1600000000000\n")
    ds = load_amazon_ratings(f)
    assert ds.interaction_count == 1


def test_steam(tmp_path):
    f = tmp_path / "australian_users_items.json"
    f.write_text(
        "{'steam_id': '7656', 'items': [{'item_id': '10', 'item_name': 'CS', 'playtime_forever': 6}]}\n"
        "{'steam_id': '7657', 'items': [{'item_id': '10', 'item_name': 'CS', 'playtime_forever': 0}, {'item_id': '20', 'item_name': 'TF2', 'playtime_forever': 2}]}\n"
    )
    ds = load_steam(f)
    assert ds.user_count == 2
    assert ds.item_count == 2
    assert ds.interaction_count == 3
    assert "name" in ds.entities("item").attribute_names


def test_msweb(tmp_path):
    f = tmp_path / "anon.data"
    f.write_text(
        textwrap.dedent("""\
        A,1287,1,"International AutoRoute","/autoroute"
        A,1288,1,"library","/library"
        C,"10001",10001
        V,1287,1
        V,1288,1
        C,"10002",10002
        V,1288,1
        """)
    )
    ds = load_ms_web(f)
    assert ds.user_count == 2
    assert ds.interaction_count == 3
    ilc = load_ms_web(f, format="collection")
    assert len(ilc) == 2
    assert len(ilc.lookup(10001)) == 2
