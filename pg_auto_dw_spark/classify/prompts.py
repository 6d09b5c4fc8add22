"""Prompt templates for the three classification questions
(reference: extension/src/model/prompt_template.rs:11-427).

Written from scratch against the same response contracts; the
substitution slots ({new_json}, {column_no}, {hints}) match the
reference's renderer (utility/ollama_client.rs:38-42). Responses must
be JSON objects of exactly these shapes
(bgw_transformer_client.rs:327-379):

    {"Business Key Component Identification":
        {"Is Business Key Component": bool, "Confidence Value": float,
         "Reason": str}}
    {"Business Key Name":
        {"Name": str, "Confidence Value": float, "Reason": str}}
    {"Descriptor - Sensitive":
        {"Is PII": bool, "Confidence Value": float, "Reason": str}}
"""

from __future__ import annotations

from enum import Enum


class PromptTemplate(Enum):
    BK_COMPONENT_IDENTIFICATION = "bk_component_identification"
    BK_NAME = "bk_name"
    DESCRIPTOR_SENSITIVE = "descriptor_sensitive"


_TEMPLATES = {
    PromptTemplate.BK_COMPONENT_IDENTIFICATION: (
        "You are a data-vault modeling assistant. Given the table below,\n"
        "decide whether column number {column_no} is a component of the\n"
        "table's business key (a natural or surrogate identifier part).\n"
        "Table:\n{new_json}\n{hints}\n"
        'Respond with JSON only, exactly: {{"Business Key Component '
        'Identification": {{"Is Business Key Component": <bool>, '
        '"Confidence Value": <0..1>, "Reason": "<why>"}}}}'
    ),
    PromptTemplate.BK_NAME: (
        "You are a data-vault modeling assistant. Column number\n"
        "{column_no} of the table below is a business-key component.\n"
        "Propose the business-key entity name (singular noun).\n"
        "Table:\n{new_json}\n{hints}\n"
        'Respond with JSON only, exactly: {{"Business Key Name": '
        '{{"Name": "<name>", "Confidence Value": <0..1>, '
        '"Reason": "<why>"}}}}'
    ),
    PromptTemplate.DESCRIPTOR_SENSITIVE: (
        "You are a data-governance assistant. Decide whether column\n"
        "number {column_no} of the table below is likely to contain\n"
        "personally identifiable information (PII).\n"
        "Table:\n{new_json}\n{hints}\n"
        'Respond with JSON only, exactly: {{"Descriptor - Sensitive": '
        '{{"Is PII": <bool>, "Confidence Value": <0..1>, '
        '"Reason": "<why>"}}}}'
    ),
}


def render(template: PromptTemplate, table_details_json: str, column_no: int, hints: str) -> str:
    return _TEMPLATES[template].format(
        new_json=table_details_json, column_no=column_no, hints=hints
    )
