"""Helpers to build a BusinessKey graph from a simple table spec.

The reference assembles the graph from accepted transformer responses
(extension/src/controller/dv_builder.rs:74-160): BK-part links from
'Business Key Part' rows (alias = source column name), descriptors from
'Descriptor' / 'Descriptor - Sensitive' rows (orbit = source table
name), BK name = last non-'na' business_key_name. This module provides
the same assembly from plain Python data, used by tests, the oracle
queries, and go() once classification has run.
"""

from __future__ import annotations

from ..model.dv_schema import (
    BusinessKey,
    ColumnData,
    Descriptor,
    DescriptorLink,
    DVSchema,
)
from ..model.dv_schema import BusinessKeyPartLink


def column_data(
    schema_name: str,
    table_name: str,
    column_name: str,
    column_type_name: str,
    ordinal: int,
    system_id: int = 0,
    table_oid: int = 0,
) -> ColumnData:
    return ColumnData(
        system_id=system_id,
        schema_name=schema_name,
        table_oid=table_oid,
        table_name=table_name,
        column_name=column_name,
        column_ordinal_position=ordinal,
        column_type_name=column_type_name,
    )


def business_key_from_spec(
    schema_name: str,
    table_name: str,
    bk_name: str,
    key_columns: list[tuple[str, str]],
    descriptor_columns: list[tuple[str, str, bool]],
) -> BusinessKey:
    """Build a BusinessKey like dv_builder::build_business_keys does.

    key_columns: [(column_name, type_name)] -- alias = column name
    (dv_builder.rs:117: alias defaults to the source column name).
    descriptor_columns: [(column_name, type_name, is_sensitive)] --
    orbit = source table name (dv_builder.rs:92).
    """
    part_links = []
    descriptors = []
    ordinal = 1
    for col, typ in key_columns:
        part_links.append(
            BusinessKeyPartLink(
                alias=col,
                source_columns=[
                    column_data(schema_name, table_name, col, typ, ordinal)
                ],
            )
        )
        ordinal += 1
    for col, typ, sensitive in descriptor_columns:
        descriptors.append(
            Descriptor(
                descriptor_link=DescriptorLink(
                    alias=col,
                    source_column=column_data(schema_name, table_name, col, typ, ordinal),
                ),
                orbit=table_name,
                is_sensitive=sensitive,
            )
        )
        ordinal += 1
    return BusinessKey(
        name=bk_name, business_key_part_links=part_links, descriptors=descriptors
    )


def dv_schema_from_spec(dw_schema: str, business_keys: list[BusinessKey]) -> DVSchema:
    return DVSchema(dw_schema=dw_schema, business_keys=business_keys)
