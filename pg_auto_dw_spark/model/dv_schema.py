"""DVSchema metadata graph: dataclasses + JSON round-trip.

Re-expresses the reference's nested struct graph (reference:
extension/src/model/dv_schema.rs:5-85):

    DVSchema -> Vec<BusinessKey>
    BusinessKey -> { Vec<BusinessKeyPartLink>, Vec<Descriptor> }
    BusinessKeyPartLink -> { alias, Vec<ColumnData> source, target? }
    Descriptor -> { DescriptorLink, orbit, is_sensitive }

The serialized JSON keeps the reference's serde rename keys ("ID",
"DW Schema", "Business Keys", ...) so a ``dv_repo`` row produced by
either system round-trips through the other. Persisted to ``dv_repo``
keyed by build_id (reference: controller/dv_builder.rs:205-228,
reloaded at dv_loader.rs:5-44).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field


def new_id() -> str:
    """UUID v4, as the reference mints for every node (dv_builder.rs:84,110,140,176)."""
    return str(uuid.uuid4())


@dataclass
class ColumnData:
    """One side of a link (reference: model/dv_schema.rs:72-85)."""

    system_id: int
    schema_name: str
    table_oid: int
    table_name: str
    column_name: str
    column_ordinal_position: int
    column_type_name: str
    id: str = field(default_factory=new_id)

    def to_dict(self) -> dict:
        return {
            "ID": self.id,
            "System ID": self.system_id,
            "Schema Name": self.schema_name,
            "Table OID": self.table_oid,
            "Table Name": self.table_name,
            "Column Name": self.column_name,
            "Column Ordinal Position": self.column_ordinal_position,
            "Column Type": self.column_type_name,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnData":
        return cls(
            id=d["ID"],
            system_id=d["System ID"],
            schema_name=d["Schema Name"],
            table_oid=d["Table OID"],
            table_name=d["Table Name"],
            column_name=d["Column Name"],
            column_ordinal_position=d["Column Ordinal Position"],
            column_type_name=d["Column Type"],
        )


@dataclass
class BusinessKeyPartLink:
    """BK part: source column(s) feeding a hub ``<alias>_bk`` column
    (reference: model/dv_schema.rs:31-41)."""

    alias: str
    source_columns: list[ColumnData]
    target_column: ColumnData | None = None
    id: str = field(default_factory=new_id)

    def to_dict(self) -> dict:
        return {
            "ID": self.id,
            "Alias": self.alias,
            "Source Column Data": [c.to_dict() for c in self.source_columns],
            "Target Column Data": self.target_column.to_dict() if self.target_column else None,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BusinessKeyPartLink":
        return cls(
            id=d["ID"],
            alias=d["Alias"],
            source_columns=[ColumnData.from_dict(c) for c in d["Source Column Data"]],
            target_column=(
                ColumnData.from_dict(d["Target Column Data"])
                if d.get("Target Column Data")
                else None
            ),
        )


@dataclass
class DescriptorLink:
    """Descriptor source->satellite column link
    (reference: model/dv_schema.rs:55-66)."""

    alias: str
    source_column: ColumnData | None = None
    target_column: ColumnData | None = None
    id: str = field(default_factory=new_id)

    def to_dict(self) -> dict:
        return {
            "ID": self.id,
            "Alias": self.alias,
            "Source Column Data": self.source_column.to_dict() if self.source_column else None,
            "Target Column Data": self.target_column.to_dict() if self.target_column else None,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "DescriptorLink":
        return cls(
            id=d["ID"],
            alias=d["Alias"],
            source_column=(
                ColumnData.from_dict(d["Source Column Data"])
                if d.get("Source Column Data")
                else None
            ),
            target_column=(
                ColumnData.from_dict(d["Target Column Data"])
                if d.get("Target Column Data")
                else None
            ),
        )


@dataclass
class Descriptor:
    """Descriptor with orbit + sensitivity; sensitive descriptors land in
    a separate ``<orbit>_sensitive`` satellite (reference:
    dv_schema.rs:43-53, dv_builder.rs:406-416)."""

    descriptor_link: DescriptorLink
    orbit: str
    is_sensitive: bool
    id: str = field(default_factory=new_id)

    def satellite_key(self) -> str:
        """Satellite table key: orbit [+ "_sensitive"] (dv_builder.rs:406-416)."""
        return self.orbit + ("_sensitive" if self.is_sensitive else "")

    def to_dict(self) -> dict:
        return {
            "ID": self.id,
            "Descriptor Link": self.descriptor_link.to_dict(),
            "Orbit": self.orbit,
            "Is Sensitive": self.is_sensitive,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Descriptor":
        return cls(
            id=d["ID"],
            descriptor_link=DescriptorLink.from_dict(d["Descriptor Link"]),
            orbit=d["Orbit"],
            is_sensitive=bool(d["Is Sensitive"]),
        )


@dataclass
class BusinessKey:
    """One hub-to-be: BK name + part links + descriptors
    (reference: dv_schema.rs:19-29)."""

    name: str
    business_key_part_links: list[BusinessKeyPartLink]
    descriptors: list[Descriptor] = field(default_factory=list)
    id: str = field(default_factory=new_id)

    def source_table(self) -> tuple[str, str]:
        src = self.business_key_part_links[0].source_columns[0]
        return src.schema_name, src.table_name

    def satellites(self) -> dict[str, list[Descriptor]]:
        """Group descriptors by satellite key, preserving insertion order
        (reference buckets into a HashMap at dv_loader.rs:222-240; we
        keep deterministic ordering instead)."""
        out: dict[str, list[Descriptor]] = {}
        for d in self.descriptors:
            out.setdefault(d.satellite_key(), []).append(d)
        return out

    def to_dict(self) -> dict:
        return {
            "ID": self.id,
            "Name": self.name,
            "Business Key Part Links": [p.to_dict() for p in self.business_key_part_links],
            "Descriptors": [d.to_dict() for d in self.descriptors],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BusinessKey":
        return cls(
            id=d["ID"],
            name=d["Name"],
            business_key_part_links=[
                BusinessKeyPartLink.from_dict(p) for p in d["Business Key Part Links"]
            ],
            descriptors=[Descriptor.from_dict(x) for x in d.get("Descriptors", [])],
        )


@dataclass
class DVSchema:
    """Root of the graph (reference: dv_schema.rs:5-17)."""

    dw_schema: str
    business_keys: list[BusinessKey]
    create_timestamp_gmt: str = "1970-01-01T00:00:00"
    modified_timestamp_gmt: str = "1970-01-01T00:00:00"
    id: str = field(default_factory=new_id)

    def to_json(self) -> str:
        return json.dumps(
            {
                "ID": self.id,
                "DW Schema": self.dw_schema,
                "Create Date": self.create_timestamp_gmt,
                "Modified Date": self.modified_timestamp_gmt,
                "Business Keys": [b.to_dict() for b in self.business_keys],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "DVSchema":
        d = json.loads(s)
        return cls(
            id=d["ID"],
            dw_schema=d["DW Schema"],
            create_timestamp_gmt=d["Create Date"],
            modified_timestamp_gmt=d["Modified Date"],
            business_keys=[BusinessKey.from_dict(b) for b in d["Business Keys"]],
        )
