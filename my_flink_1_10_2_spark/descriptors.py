"""The connect() descriptor API (ref: flink-python/pyflink/table/
descriptors.py — Rowtime:72, Schema:175, OldCsv:272, Csv:381, Avro:512,
Json:545, FileSystem:676, Kafka:697; TableEnvironment.connect
table_environment.py:682; sources.py CsvTableSource:35, sinks.py
CsvTableSink:40).

Programs written against Flink 1.10's fluent descriptor surface run
unchanged: descriptors collect the same properties the reference's
`.to_properties()` exposes, and `create_temporary_table` lowers them
onto this engine's DDL machinery (`ddl.CreateTable`), so the registered
names work everywhere a DDL table works — batch reads, `stream_table`
watermarked streams, and the INSERT INTO sink path.
"""

from __future__ import annotations

from my_flink_1_10_2_spark.ddl import CreateTable, _batch_reader, _flink_type


class Descriptor:
    def __init__(self):
        self._props: dict[str, str] = {}

    def to_properties(self) -> dict[str, str]:
        """ref: descriptors.py:63 — the flattened property map."""
        return dict(self._props)


class Rowtime(Descriptor):
    """ref: descriptors.py:72."""

    def __init__(self):
        super().__init__()
        self.field: str | None = None
        self.delay_ms: int = 0

    def timestamps_from_field(self, field_name: str) -> "Rowtime":
        self.field = field_name
        self._props["rowtime.timestamps.type"] = "from-field"
        self._props["rowtime.timestamps.from"] = field_name
        return self

    def watermarks_periodic_ascending(self) -> "Rowtime":
        self.delay_ms = 0
        self._props["rowtime.watermarks.type"] = "periodic-ascending"
        return self

    def watermarks_periodic_bounded(self, delay: int) -> "Rowtime":
        """`delay` in milliseconds, as in the reference (:136)."""
        self.delay_ms = int(delay)
        self._props["rowtime.watermarks.type"] = "periodic-bounded"
        self._props["rowtime.watermarks.delay"] = str(delay)
        return self


class Schema(Descriptor):
    """ref: descriptors.py:175 — ordered fields + optional rowtime."""

    def __init__(self):
        super().__init__()
        self.fields: list[tuple[str, str]] = []  # (name, spark type)
        self.rowtime_spec: tuple[str, int] | None = None  # (col, delay ms)
        self._last_field: str | None = None

    def field(self, field_name: str, field_type: str) -> "Schema":
        self.fields.append((field_name, _flink_type(field_type)))
        self._last_field = field_name
        self._props[f"schema.{len(self.fields)-1}.name"] = field_name
        self._props[f"schema.{len(self.fields)-1}.type"] = field_type
        return self

    def rowtime(self, rowtime: Rowtime) -> "Schema":
        col = rowtime.field or self._last_field
        if col is None:
            raise ValueError("rowtime needs timestamps_from_field or a preceding field")
        self.rowtime_spec = (col, rowtime.delay_ms)
        self._props.update(rowtime.to_properties())
        return self

    def proctime(self) -> "Schema":
        """ref: :236 — an appended processing-time attribute."""
        if self._last_field is None:
            raise ValueError("proctime() must follow a field(...)")
        self._props[f"schema.{len(self.fields)-1}.proctime"] = "true"
        return self


class FormatDescriptor(Descriptor):
    format_type: str = ""


class OldCsv(FormatDescriptor):
    """ref: descriptors.py:272 (format.type=csv, legacy)."""

    format_type = "csv"

    def __init__(self):
        super().__init__()
        self._props["format.type"] = "csv"
        self.options: dict[str, str] = {}

    def field_delimiter(self, delimiter: str) -> "OldCsv":
        self.options["csv.field-delimiter"] = delimiter
        self._props["format.field-delimiter"] = delimiter
        return self

    def ignore_first_line(self) -> "OldCsv":
        self.options["csv.header"] = "true"
        self._props["format.ignore-first-line"] = "true"
        return self

    def ignore_parse_errors(self) -> "OldCsv":
        self.options["csv.mode"] = "DROPMALFORMED"
        self._props["format.ignore-parse-errors"] = "true"
        return self

    # the legacy descriptor also declares its own fields; the Schema wins
    def field(self, field_name: str, field_type: str) -> "OldCsv":
        self._props[f"format.fields.{field_name}"] = field_type
        return self


class Csv(OldCsv):
    """ref: descriptors.py:381 (RFC-4180 format.type=csv)."""

    def line_delimiter(self, delimiter: str) -> "Csv":
        self._props["format.line-delimiter"] = delimiter
        return self

    def quote_character(self, ch: str) -> "Csv":
        self.options["csv.quote"] = ch
        self._props["format.quote-character"] = ch
        return self

    def derive_schema(self) -> "Csv":
        self._props["format.derive-schema"] = "true"
        return self


class Json(FormatDescriptor):
    """ref: descriptors.py:545."""

    format_type = "json"

    def __init__(self):
        super().__init__()
        self._props["format.type"] = "json"
        self.options: dict[str, str] = {}

    def fail_on_missing_field(self, fail: bool) -> "Json":
        self._props["format.fail-on-missing-field"] = str(bool(fail)).lower()
        return self

    def derive_schema(self) -> "Json":
        self._props["format.derive-schema"] = "true"
        return self


class Avro(FormatDescriptor):
    """ref: descriptors.py:512 — reads through the engine's Avro path
    (native datasource when the jar exists, pure-Python codec else)."""

    format_type = "avro"

    def __init__(self):
        super().__init__()
        self._props["format.type"] = "avro"
        self.options: dict[str, str] = {}

    def avro_schema(self, avro_schema: str) -> "Avro":
        self._props["format.avro-schema"] = avro_schema
        return self


class ConnectorDescriptor(Descriptor):
    connector_type: str = ""


class FileSystem(ConnectorDescriptor):
    """ref: descriptors.py:676."""

    connector_type = "filesystem"

    def __init__(self):
        super().__init__()
        self._props["connector.type"] = "filesystem"
        self._path: str | None = None

    def path(self, path_str: str) -> "FileSystem":
        self._path = path_str
        self._props["connector.path"] = path_str
        return self


class Kafka(ConnectorDescriptor):
    """ref: descriptors.py:697 — lowered onto the kafka_source option
    mapping (`sources/streaming.py`); building the descriptor needs no
    broker, reading does."""

    connector_type = "kafka"

    def __init__(self):
        super().__init__()
        self._props["connector.type"] = "kafka"
        self.topic_name: str | None = None
        self.startup = "group-offsets"
        self.props: dict[str, str] = {}

    def version(self, version: str) -> "Kafka":
        self._props["connector.version"] = str(version)
        return self

    def topic(self, topic: str) -> "Kafka":
        self.topic_name = topic
        self._props["connector.topic"] = topic
        return self

    def property(self, key: str, value: str) -> "Kafka":
        self.props[key] = value
        self._props[f"connector.properties.{key}"] = value
        return self

    def properties(self, property_dict: dict) -> "Kafka":
        for k, v in property_dict.items():
            self.property(k, v)
        return self

    def start_from_earliest(self) -> "Kafka":
        self.startup = "earliest-offset"
        self._props["connector.startup-mode"] = "earliest-offset"
        return self

    def start_from_latest(self) -> "Kafka":
        self.startup = "latest-offset"
        self._props["connector.startup-mode"] = "latest-offset"
        return self

    def start_from_group_offsets(self) -> "Kafka":
        self.startup = "group-offsets"
        self._props["connector.startup-mode"] = "group-offsets"
        return self


class ConnectTableDescriptor:
    """ref: table_environment.py:682 connect() → descriptor chain →
    create_temporary_table / register_table_source (1.10 spelling)."""

    def __init__(self, env, connector: ConnectorDescriptor):
        self.env = env
        self.connector = connector
        self.format: FormatDescriptor | None = None
        self.schema_desc: Schema | None = None
        self._update_mode = "append"

    def with_format(self, fmt: FormatDescriptor) -> "ConnectTableDescriptor":
        self.format = fmt
        return self

    def with_schema(self, schema: Schema) -> "ConnectTableDescriptor":
        self.schema_desc = schema
        return self

    def in_append_mode(self) -> "ConnectTableDescriptor":
        self._update_mode = "append"
        return self

    def in_upsert_mode(self) -> "ConnectTableDescriptor":
        self._update_mode = "upsert"
        return self

    def to_properties(self) -> dict[str, str]:
        props: dict[str, str] = {"update-mode": self._update_mode}
        props.update(self.connector.to_properties())
        if self.format is not None:
            props.update(self.format.to_properties())
        if self.schema_desc is not None:
            props.update(self.schema_desc.to_properties())
        return props

    def _to_create_table(self, name: str) -> CreateTable:
        if self.schema_desc is None or not self.schema_desc.fields:
            raise ValueError("connect() needs with_schema(Schema().field(...))")
        watermark = None
        if self.schema_desc.rowtime_spec is not None:
            col, delay_ms = self.schema_desc.rowtime_spec
            watermark = (col, f"{delay_ms / 1000.0:g} seconds")
        if isinstance(self.connector, FileSystem):
            if self.connector._path is None:
                raise ValueError("FileSystem() needs .path(...)")
            fmt = self.format.format_type if self.format else "csv"
            options = {"connector": "filesystem", "path": self.connector._path,
                       "format": fmt}
            options.update(getattr(self.format, "options", {}) or {})
        elif isinstance(self.connector, Kafka):
            if self.connector.topic_name is None:
                raise ValueError("Kafka() needs .topic(...)")
            options = {"connector": "kafka", "topic": self.connector.topic_name,
                       "scan.startup.mode": self.connector.startup}
            options.update(
                {f"properties.{k}": v for k, v in self.connector.props.items()}
            )
        else:
            raise NotImplementedError(
                f"connector {type(self.connector).__name__} has no lowering here"
            )
        return CreateTable(
            name=name,
            columns=list(self.schema_desc.fields),
            watermark=watermark,
            primary_key=[],
            options=options,
            partition_keys=[],
        )

    def create_temporary_table(self, name: str) -> None:
        """Register under `name`; FileSystem tables read immediately
        (empty if the path does not exist yet — sink-first works), Kafka
        tables defer to stream_table/kafka_source at read time."""
        ct = self._to_create_table(name)
        self.env._ddl_tables[name] = ct
        if isinstance(self.connector, FileSystem):
            _batch_reader(self.env.spark, ct).createOrReplaceTempView(name)
        self.env._register_in_catalog(ct)

    # 1.10 spellings
    register_table_source = create_temporary_table
    register_table_sink = create_temporary_table
    register_table_source_and_sink = create_temporary_table


class CsvTableSource:
    """ref: sources.py:35 — (path, field_names, field_types)."""

    def __init__(self, source_path: str, field_names, field_types):
        self.path = source_path
        self.fields = [
            (n, _flink_type(t)) for n, t in zip(field_names, field_types)
        ]

    def to_create_table(self, name: str) -> CreateTable:
        return CreateTable(
            name=name, columns=list(self.fields), watermark=None, primary_key=[],
            options={"connector": "filesystem", "path": self.path, "format": "csv"},
            partition_keys=[],
        )


class CsvTableSink:
    """ref: sinks.py:40 — (field_names, field_types, path, ...)."""

    def __init__(self, field_names, field_types, path: str, field_delimiter: str = ","):
        self.path = path
        self.delimiter = field_delimiter
        self.fields = [
            (n, _flink_type(t)) for n, t in zip(field_names, field_types)
        ]

    def to_create_table(self, name: str) -> CreateTable:
        return CreateTable(
            name=name, columns=list(self.fields), watermark=None, primary_key=[],
            options={"connector": "filesystem", "path": self.path, "format": "csv"},
            partition_keys=[],
        )
