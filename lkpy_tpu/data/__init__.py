"""
The lkpy-tpu data layer: vocabularies, item lists, datasets.

Capability parity with reference ``lenskit.data``
(reference: src/lenskit/data/__init__.py).
"""

from lkpy_tpu.data.adapt import from_interactions_df
from lkpy_tpu.data.batches import BatchedRange
from lkpy_tpu.data.builder import DatasetBuilder
from lkpy_tpu.data.collection import (
    ItemListCollection,
    ItemListCollector,
    ListILC,
    MutableItemListCollection,
)
from lkpy_tpu.data.dataset import (
    DataContainer,
    Dataset,
    EntityAttribute,
    EntitySet,
    MatrixRelationshipSet,
    RelationshipSet,
)
from lkpy_tpu.data.flatten import flatten_dict, unflatten_dict
from lkpy_tpu.data.items import ItemList
from lkpy_tpu.data.keys import GenericKey, QueryIDKey, UserIDKey, create_key_type, key_dict, project_key
from lkpy_tpu.data.matrix import COO, CSR
from lkpy_tpu.data.movielens import load_movielens, load_movielens_df
from lkpy_tpu.data.query import QueryInput, QueryItemSource, RecQuery
from lkpy_tpu.data.schema import AttrLayout, ColumnSpec, DataSchema, EntitySchema, RelationshipSchema
from lkpy_tpu.data.sources import load_amazon_ratings, load_ms_web, load_steam
from lkpy_tpu.data.types import ID, NPID, FeedbackType
from lkpy_tpu.data.vocab import Vocabulary
from lkpy_tpu.diagnostics import FieldError

__all__ = [
    "AttrLayout",
    "COO",
    "CSR",
    "ColumnSpec",
    "DataSchema",
    "Dataset",
    "DatasetBuilder",
    "EntitySchema",
    "EntitySet",
    "ItemList",
    "ItemListCollection",
    "MatrixRelationshipSet",
    "QueryInput",
    "RecQuery",
    "RelationshipSchema",
    "RelationshipSet",
    "Vocabulary",
    "from_interactions_df",
    "load_movielens",
    "load_movielens_df",
]
