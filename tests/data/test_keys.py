"""
Collection-key semantics (reference: tests in lenskit's collection suite
exercising src/lenskit/data/_collection/_keys.py: key types are cached
namedtuples, generic keys pickle by reconstruction, and keys project onto
subset key types).
"""

import pickle

import numpy as np
import pytest

from lkpy_tpu.data import ItemList, ItemListCollection, create_key_type, key_dict, project_key
from lkpy_tpu.data.keys import QueryIDKey, UserIDKey, create_key, key_fields


def test_builtin_key_types_are_canonical():
    # the cache pre-seeds the well-known field sets with the named classes
    assert create_key_type("user_id") is UserIDKey
    assert create_key_type("query_id") is QueryIDKey


def test_key_type_cache_returns_same_type():
    k1 = create_key_type("user_id", "seq_no")
    k2 = create_key_type("user_id", "seq_no")
    assert k1 is k2
    # different field order is a different type
    k3 = create_key_type("seq_no", "user_id")
    assert k3 is not k1


def test_key_fields_and_dict():
    kt = create_key_type("user_id", "fold")
    key = kt(42, 3)
    assert key_fields(kt) == ("user_id", "fold")
    assert key_dict(key) == {"user_id": 42, "fold": 3}


def test_create_key_from_field_list():
    key = create_key(("user_id", "fold"), 7, 1)
    assert key == (7, 1)
    assert key.user_id == 7
    assert key.fold == 1
    # and from an existing type
    key2 = create_key(UserIDKey, 9)
    assert isinstance(key2, UserIDKey)
    assert key2.user_id == 9


def test_generic_key_pickles_by_reconstruction():
    kt = create_key_type("user_id", "session")
    key = kt("u1", 5)
    blob = pickle.dumps(key)
    back = pickle.loads(blob)
    assert back == key
    assert back._fields == ("user_id", "session")
    # unpickling reconstructs through the cache: same canonical type object
    assert type(back) is create_key_type("user_id", "session")


def test_named_key_pickles():
    key = UserIDKey(31)
    back = pickle.loads(pickle.dumps(key))
    assert back == key
    assert isinstance(back, UserIDKey)


def test_project_key_subset():
    run_kt = create_key_type("user_id", "rep")
    run_key = run_kt(17, 2)
    proj = project_key(run_key, UserIDKey)
    assert isinstance(proj, UserIDKey)
    assert proj.user_id == 17


def test_project_key_identity():
    key = UserIDKey(4)
    assert project_key(key, UserIDKey) is key


def test_project_key_missing_field_raises():
    with pytest.raises(TypeError, match="cannot project"):
        project_key(QueryIDKey(1), UserIDKey)


def test_ilc_lookup_with_projected_key():
    # the motivating use: look up test truth (keyed by user) with a
    # (user, rep) run key (reference: ItemListCollection.lookup_projected)
    truth = ItemListCollection.from_dict(
        {UserIDKey(1): ItemList(item_ids=[10, 11]), UserIDKey(2): ItemList(item_ids=[12])},
        key=("user_id",),
    )
    run_kt = create_key_type("user_id", "rep")
    il = truth.lookup_projected(run_kt(2, 0))
    assert il is not None
    assert list(il.ids()) == [12]
    assert truth.lookup_projected(run_kt(99, 0)) is None
