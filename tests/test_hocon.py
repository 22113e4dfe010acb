"""HOCON config loader: the reference's native repository config format
(ConfigRepository.java:372-401; shape mirrors the reference's
core/src/test/resources/test-readme.conf example) must parse to the same
catalog the dict form produces."""

import pytest

from proxima_platform_spark.catalog import hocon
from proxima_platform_spark.catalog.descriptors import AccessType, StorageType
from proxima_platform_spark.catalog.repository import Repository

# Mirrors the *shape* of the reference's test-readme.conf (entities with
# plain + wildcard attributes, families with substituted storage URIs,
# unknown keys like cqlFactory) using this engine's storage schemes.
README_STYLE_CONF = """
entities {
  # user entity, kept simple
  user {
    attributes {
      details { scheme: "json" }
      preferences { scheme: "json" }
      "event.*" { scheme: "bytes" }
    }
  }
  product {
    attributes {
      price { scheme: "double" }
      details { scheme: "json" }
      "category.*" { scheme: "string" }
    }
  }
  event {
    attributes {
      data { scheme: "bytes" }
    }
  }
}

attributeFamilies {
  user-random-access {
    entity: user
    attributes: [ "details", "preferences" ]
    storage: "parquet://"${paths.base}/${paths.user-table}
    type: primary
    access: random-access
  }
  user-event-history-store {
    entity: event
    attributes: [ "data" ]
    storage: "parquet://"${paths.base}/${paths.user-event-table}/
    cqlFactory: some.unknown.Factory   // tolerated, like the dict form
    type: replica
    access: write-only
  }
  product-random-access {
    entity: product
    attributes: [ "*" ]
    storage: "parquet://"${paths.base}/${paths.product-table}
    type: primary
    access: [ random-access, batch-snapshot ]
  }
  event-commit-log {
    entity: event
    attributes: [ "*" ]
    storage: "kafka://"${kafka.brokers}/${kafka.events-topic}
    type: primary
    access: commit-log
  }
}

paths {
  base = "/data/warehouse"
  user-table = "user"
  user-event-table = "user_event"
  product-table = "product"
}

kafka {
  brokers = "broker-1:9092"
  events-topic = "events"
}
"""


class TestParser:
    def test_basic_forms(self):
        out = hocon.loads('a: 1\nb = "two"\nc { d: true\ne: 1.5 }\nf: null')
        assert out == {"a": 1, "b": "two", "c": {"d": True, "e": 1.5}, "f": None}

    def test_root_braces_optional(self):
        assert hocon.loads("{ a: 1 }") == hocon.loads("a: 1")

    def test_dotted_keys_expand(self):
        assert hocon.loads("a.b.c = 1\na.b.d = 2") == {"a": {"b": {"c": 1, "d": 2}}}

    def test_duplicate_objects_deep_merge(self):
        out = hocon.loads("a { x: 1 }\na { y: 2 }\na.x = 3")
        assert out == {"a": {"x": 3, "y": 2}}

    def test_comments_and_trailing_commas(self):
        out = hocon.loads("# c1\na: [1, 2,] // c2\nb: 3, c: 4")
        assert out == {"a": [1, 2], "b": 3, "c": 4}

    def test_substitution_and_concatenation(self):
        out = hocon.loads(
            'base = "host:1234"\nurl = "kafka://"${base}/topic\nn = ${num}\nnum = 7'
        )
        assert out["url"] == "kafka://host:1234/topic"
        assert out["n"] == 7  # non-string substitution keeps its type

    def test_optional_substitution_dropped(self):
        out = hocon.loads("a = ${?missing}\nb = 1")
        assert out == {"b": 1}

    def test_missing_substitution_raises(self):
        with pytest.raises(hocon.HoconError, match="unresolved"):
            hocon.loads("a = ${nope}")

    def test_quoted_keeps_string_type(self):
        out = hocon.loads('a: "1"\nb: 1\nc: "true"\nd: true')
        assert out == {"a": "1", "b": 1, "c": "true", "d": True}

    def test_unsupported_forms_raise(self):
        with pytest.raises(hocon.HoconError, match="include"):
            hocon.loads('include "other.conf"')
        with pytest.raises(hocon.HoconError, match="multi-line"):
            hocon.loads('a: """x"""')

    def test_unquoted_string_with_spaces(self):
        assert hocon.loads("a: hello world\n") == {"a": "hello world"}

    def test_unquoted_colon_value_raises_not_hangs(self):
        """Regression: 'key = a:b' used to spin the parser forever; the spec
        ends unquoted strings at ':' so this must be a clear error."""
        with pytest.raises(hocon.HoconError, match="quote the string"):
            hocon.loads("key = a:b")
        with pytest.raises(hocon.HoconError):
            hocon.loads("storage = kafka://broker/topic\n")  # unquoted URI

    def test_plus_equals_raises_cleanly(self):
        with pytest.raises(hocon.HoconError, match="not supported"):
            hocon.loads("a += [1]")

    def test_concat_preserves_inter_piece_whitespace(self):
        """Spec: 'hello ${name}' → 'hello Bob', not 'helloBob'."""
        out = hocon.loads('name = "Bob"\ngreeting = hello ${name}')
        assert out["greeting"] == "hello Bob"
        out2 = hocon.loads('a = "x"\nb = ${a} ${a}\nc = ${a}${a}')
        assert out2["b"] == "x x" and out2["c"] == "xx"


class TestRepositoryFromHocon:
    def test_readme_style_config_parses(self):
        repo = Repository.from_hocon(README_STYLE_CONF)
        assert set(repo.entities) == {"user", "product", "event"}
        user = repo.entity("user")
        assert {a.name for a in user.attributes} == {
            "details",
            "preferences",
            "event.*",
        }
        fam = repo.families["user-random-access"]
        assert fam.storage_uri == "parquet:///data/warehouse/user"
        assert fam.storage_type is StorageType.PRIMARY
        assert fam.access == frozenset({AccessType.RANDOM_ACCESS})
        kafka = repo.families["event-commit-log"]
        assert kafka.storage_uri == "kafka://broker-1:9092/events"
        prod = repo.families["product-random-access"]
        assert fam.attributes == ("details", "preferences")
        assert prod.access == frozenset(
            {AccessType.RANDOM_ACCESS, AccessType.BATCH_SNAPSHOT}
        )

    def test_hocon_equals_dict_form(self):
        """The core parity check: HOCON text and the equivalent dict build
        identical catalogs."""
        repo_h = Repository.from_hocon(README_STYLE_CONF)
        repo_d = Repository.of(
            {
                "entities": {
                    "user": {
                        "attributes": {
                            "details": {"scheme": "json"},
                            "preferences": {"scheme": "json"},
                            "event.*": {"scheme": "bytes"},
                        }
                    },
                    "product": {
                        "attributes": {
                            "price": {"scheme": "double"},
                            "details": {"scheme": "json"},
                            "category.*": {"scheme": "string"},
                        }
                    },
                    "event": {"attributes": {"data": {"scheme": "bytes"}}},
                },
                "attributeFamilies": {
                    "user-random-access": {
                        "entity": "user",
                        "attributes": ["details", "preferences"],
                        "storage": "parquet:///data/warehouse/user",
                        "type": "primary",
                        "access": ["random-access"],
                    },
                    "user-event-history-store": {
                        "entity": "event",
                        "attributes": ["data"],
                        "storage": "parquet:///data/warehouse/user_event/",
                        "type": "replica",
                        "access": ["write-only"],
                    },
                    "product-random-access": {
                        "entity": "product",
                        "attributes": ["*"],
                        "storage": "parquet:///data/warehouse/product",
                        "type": "primary",
                        "access": ["random-access", "batch-snapshot"],
                    },
                    "event-commit-log": {
                        "entity": "event",
                        "attributes": ["*"],
                        "storage": "kafka://broker-1:9092/events",
                        "type": "primary",
                        "access": ["commit-log"],
                    },
                },
            }
        )
        assert repo_h.entities == repo_d.entities
        assert repo_h.families == repo_d.families

    def test_reference_storage_uri_concatenation_shapes(self):
        """The reference's test-readme.conf builds storage URIs by
        concatenating quoted strings, ${substitutions} with dashed path
        segments, and unquoted '/' pieces — all without whitespace
        (core/src/test/resources/test-readme.conf:53,62,77). Mirror those
        exact shapes and assert byte-identical resolution."""
        conf = """
        fams {
          a { storage: "cassandra://"${cassandra.seed}/${cassandra.user-table}"?primary=user" }
          b { storage: "cassandra://"${cassandra.seed}/${cassandra.event-table}/ }
          c { storage: "kafka://"${kafka.brokers}/${kafka.topic} }
        }
        cassandra {
          seed = "cas:9042"
          user-table = "user"
          event-table = "user_event"
        }
        kafka {
          brokers = "k1:9092,k2:9092"
          topic = "events"
        }
        """
        out = hocon.loads(conf)
        assert out["fams"]["a"]["storage"] == "cassandra://cas:9042/user?primary=user"
        assert out["fams"]["b"]["storage"] == "cassandra://cas:9042/user_event/"
        assert out["fams"]["c"]["storage"] == "kafka://k1:9092,k2:9092/events"

    def test_scalar_access_promoted_to_list(self):
        """`access: random-access` (scalar, as the reference fixture writes
        it) must behave like `access: [random-access]`."""
        repo = Repository.from_hocon(README_STYLE_CONF)
        assert repo.families["event-commit-log"].access == frozenset(
            {AccessType.COMMIT_LOG}
        )
