"""Prompt templates for the three classification questions
(reference: extension/src/model/prompt_template.rs:11-427).

Full-fidelity port of the reference's prompt *structure* -- task
title, request details, confidence convention, few-shot examples, and
the trailing {hints} / {new_json} / {column_no} substitution block
(rendered in the same order as utility/ollama_client.rs:38-42) --
re-expressed in original wording with original example tables. The
few-shot set covers the same decision space the reference teaches:

- BK component: primary key -> strong yes; generic surrogate id ->
  yes with lower confidence; composite-key member -> yes; measure and
  date columns -> no.
- BK name: entity name from a descriptive key column; falling back to
  the table name when the column name is generic (never "ID"/"number"
  suffixes).
- Descriptor sensitive: explicit PII allow/deny lists, no inference
  beyond them (extended zip yes, plain city/state no, person name and
  email yes).

Responses must be JSON objects of exactly these shapes
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


_VENDOR_TABLE = """{
  "Schema Name": "public",
  "Table Name": "vendor",
  "Column Details": [
    "Column No: 1 Named: vendor_id of type: uuid And is a primary key.  Column Comments: NA",
    "Column No: 2 Named: region of type: character varying(255) Column Comments: NA",
    "Column No: 3 Named: country of type: character(2) Column Comments: NA",
    "Column No: 4 Named: postal of type: character varying(10) Column Comments: NA"
  ]
}"""

_SHIPMENT_TABLE = """{
  "Schema Name": "logistics",
  "Table Name": "shipment_items",
  "Column Details": [
    "Column No: 1 Named: id of type: integer Column Comments: NA",
    "Column No: 2 Named: item_id of type: integer Column Comments: NA",
    "Column No: 3 Named: qty of type: integer Column Comments: NA",
    "Column No: 4 Named: shipped_on of type: date Column Comments: NA"
  ]
}"""

_SHIPMENT_TABLE_NAMED = _SHIPMENT_TABLE.replace(
    "Named: id of type: integer", "Named: shipment_id of type: integer"
)

_STAFF_TABLE = """{
  "Schema Name": "public",
  "Table Name": "staff",
  "Column Details": [
    "Column No: 1 Named: staff_id of type: uuid And is a primary key.  Column Comments: NA",
    "Column No: 2 Named: legal_name of type: character varying(255) Column Comments: NA",
    "Column No: 3 Named: contact_email of type: character varying(255) Column Comments: 'Work email for the staff member'",
    "Column No: 4 Named: wage of type: numeric Column Comments: NA"
  ]
}"""


def _example(n: int, table: str, column_no: int, output_key: str, fields: str) -> str:
    return (
        f"Example Input {n})\n"
        f"JSON Source Table Object:\n{table}\n\n"
        f"Column No: {column_no}\n\n"
        f"Example Output {n})\n"
        "{\n"
        f'  "{output_key}": {{\n{fields}\n  }}\n'
        "}\n"
    )


_BK_EXAMPLES = "\n".join(
    [
        _example(
            1, _VENDOR_TABLE, 1, "Business Key Component Identification",
            '    "Is Business Key Component": true,\n'
            '    "Confidence Value": 0.95,\n'
            "    \"Reason\": \"'vendor_id' is declared the primary key, which makes it"
            " the natural business key component for the 'vendor' table.\"",
        ),
        _example(
            2, _SHIPMENT_TABLE, 1, "Business Key Component Identification",
            '    "Is Business Key Component": true,\n'
            '    "Confidence Value": 0.75,\n'
            "    \"Reason\": \"'id' is not flagged as a primary key, but a bare"
            " integer id in a detail table usually identifies each row uniquely,"
            " so it remains a strong business key candidate.\"",
        ),
        _example(
            3, _SHIPMENT_TABLE_NAMED, 1, "Business Key Component Identification",
            '    "Is Business Key Component": true,\n'
            '    "Confidence Value": 0.85,\n'
            "    \"Reason\": \"'shipment_id' names the owning business entity of"
            " each row; even unmarked, entity-id columns of this shape are"
            " typically business key components.\"",
        ),
        _example(
            4, _SHIPMENT_TABLE_NAMED, 2, "Business Key Component Identification",
            '    "Is Business Key Component": true,\n'
            '    "Confidence Value": 0.80,\n'
            "    \"Reason\": \"'item_id' does not identify rows on its own but"
            " pairs with 'shipment_id' as part of a composite business key for"
            " the shipment line.\"",
        ),
        _example(
            5, _SHIPMENT_TABLE_NAMED, 3, "Business Key Component Identification",
            '    "Is Business Key Component": false,\n'
            '    "Confidence Value": 0.30,\n'
            "    \"Reason\": \"'qty' is a measure describing the row, not an"
            " identifier; it cannot uniquely identify the record.\"",
        ),
        _example(
            6, _SHIPMENT_TABLE_NAMED, 4, "Business Key Component Identification",
            '    "Is Business Key Component": false,\n'
            '    "Confidence Value": 0.40,\n'
            "    \"Reason\": \"'shipped_on' is contextual date information shared"
            " by many rows, so it is unlikely to be part of the business key.\"",
        ),
    ]
)

_BK_NAME_EXAMPLES = "\n".join(
    [
        _example(
            1, _VENDOR_TABLE, 1, "Business Key Name",
            '    "Name": "Vendor",\n'
            '    "Confidence Value": 0.9,\n'
            "    \"Reason\": \"'vendor_id' is the primary key and both the column"
            " and the table point at the same business entity, so 'Vendor' is the"
            " clear business key name.\"",
        ),
        _example(
            2, _SHIPMENT_TABLE, 1, "Business Key Name",
            '    "Name": "Shipment",\n'
            '    "Confidence Value": 0.85,\n'
            "    \"Reason\": \"The key column 'id' is generic, so the table name"
            " 'shipment_items' supplies the entity: each row belongs to a"
            " shipment. Confidence is slightly lower because the column name"
            " itself carries no entity information.\"",
        ),
    ]
)

_PII_EXAMPLES = "\n".join(
    [
        _example(
            1, _VENDOR_TABLE, 4, "Descriptor - Sensitive",
            '    "Is PII": true,\n'
            '    "Confidence Value": 0.85,\n'
            "    \"Reason\": \"'postal' is typed character varying(10), wide"
            " enough to hold an extended postal code, which appears on the PII"
            " list.\"",
        ),
        _example(
            2, _VENDOR_TABLE, 2, "Descriptor - Sensitive",
            '    "Is PII": false,\n'
            '    "Confidence Value": 0.90,\n'
            "    \"Reason\": \"'region' is coarse geography; it matches no item"
            " on the PII list.\"",
        ),
        _example(
            3, _STAFF_TABLE, 2, "Descriptor - Sensitive",
            '    "Is PII": true,\n'
            '    "Confidence Value": 0.95,\n'
            "    \"Reason\": \"'legal_name' holds a person's name, which is on"
            " the PII list.\"",
        ),
        _example(
            4, _STAFF_TABLE, 3, "Descriptor - Sensitive",
            '    "Is PII": true,\n'
            '    "Confidence Value": 0.98,\n'
            "    \"Reason\": \"'contact_email' (and its comment) identify an"
            " email address, which is on the PII list.\"",
        ),
    ]
)

_CLOSING = (
    "Now, based on the instructions and examples above, please generate the"
    " JSON output for the following input. {hints}\n\n"
    "JSON Source Table Object: {new_json}\n\n"
    "Column No: {column_no}\n"
)

_TEMPLATES = {
    PromptTemplate.BK_COMPONENT_IDENTIFICATION: (
        "Task Title: Business Key Component Identification by Column in JSON"
        " Source Table Object\n\n"
        "You are given a JSON Source Table Object carrying the schema name,"
        " table name, and per-column detail strings. Decide whether one"
        " specified column is a business key component, and how likely that"
        " is; the answers drive downstream data vault structures.\n\n"
        "A business key component is an attribute that forms part of a"
        " business key -- either one member of a composite key or a single"
        " key that uniquely identifies the record set. A table may hold more"
        " than one business key.\n\n"
        "Requested Task:\n\n"
        "Determine whether the column identified by its column number"
        " (\u201ccolumn no\u201d) likely represents a business key or a"
        " component of one.\n\n"
        "Request Details:\n\n"
        "If the column is a primary key (per its comments or detail string),"
        " assume it is a business key component. That does not rule out"
        " other business key components in the table, though it may lower"
        " the chance that the specified column is the only one.\n\n"
        "If the column looks like an email or username, treat it as a"
        " business key component only when no other attribute in the table"
        " could reasonably serve as one.\n\n"
        "Confidence Value:\n\n"
        "Provide a confidence score between 0 and 1, rounded to two decimal"
        " places, for the likelihood that the column is a business key"
        " component. 0.80 or higher counts as reasonably confident.\n\n"
        "Reason:\n\n"
        "Indicate why you made the decision you did.\n\n"
        "Output:\n\n"
        "Ensure the output conforms to the format shown in the examples"
        " below.\n\n" + _BK_EXAMPLES + "\n" + _CLOSING
    ),
    PromptTemplate.BK_NAME: (
        "Task Title: Business Key Naming in JSON Source Table Object with"
        " specified Column\n\n"
        "You are given a JSON Source Table Object carrying the schema name,"
        " table name, and per-column detail strings; your answers help"
        " create downstream data vault tables.\n\n"
        "Requested Task: Identify the business key name. The business key"
        " part column is already identified; its column number (\u201ccolumn"
        " no\u201d) accompanies the JSON Source Table Object. Return the name"
        " that best represents the business key from a data vault"
        " perspective.\n\n"
        "Request Details:\n\n"
        "Craft the Business Key Name from the attribute behind the business"
        " key, preferring the attribute name over the table name when it is"
        " descriptive enough. The name should state the core business"
        " entity plainly -- terms like \u201ccustomer\u201d,"
        " \u201cemployee\u201d, or \u201cseller\u201d -- never generic"
        " suffixes such as \u201cID\u201d, \u201cnumber\u201d, or"
        " \u201cEntity\u201d. When the key attribute and its comments are"
        " not descriptive enough, fall back to the table or schema name.\n\n"
        "Confidence Value: Provide a score between 0 and 1, rounded to two"
        " decimal places, for your confidence in the chosen Business Key"
        " Name. 0.80 or higher counts as reasonably confident.\n\n"
        "Reason: Indicate why you made the decision you did.\n\n"
        "Output: Ensure the output conforms to the format shown in the"
        " examples below.\n\n" + _BK_NAME_EXAMPLES + "\n" + _CLOSING
    ),
    PromptTemplate.DESCRIPTOR_SENSITIVE: (
        "Task Title: Identification of PII in JSON Source Table Object\n\n"
        "You are given a JSON Source Table Object carrying the schema name,"
        " table name, and per-column detail strings; your answers assist"
        " the creation of downstream data vault tables.\n\n"
        "Requested Task: Identify if the descriptor is a descriptor"
        " sensitive PII subtype. A descriptor column and its column number"
        " (\u201ccolumn no\u201d) are provided. If the column holds"
        " Personally Identifiable Information (PII), categorize it as"
        " \u201cDescriptor - Sensitive\u201d.\n\n"
        "Request Details:\n"
        "PII Identification: Treat a column as PII only when it directly"
        " matches an item from the PII list below; a close resemblance of"
        " the column name or comment to a listed item also counts.\n"
        "No Overgeneralization: Do not infer or project beyond the list.\n\n"
        "Personal Identifiable Information (PII) List:\n\n"
        "Treat any of the following as PII and categorize the column as"
        " \u201cDescriptor - Sensitive\u201d:\n\n"
        "- Person\u2019s Name: PII (first name, last name, or both).\n"
        "- Social Security Number (SSN): PII\n"
        "- Driver\u2019s License Number: PII\n"
        "- Passport Number: PII\n"
        "- Email Address: PII\n"
        "- Physical Street Address: PII (street address; excludes city,"
        " state, or a standard 5-digit zip).\n"
        "- Extended Zip Code: PII (any zip longer than 5 digits).\n"
        "- Telephone Number: PII (landline or mobile).\n"
        "- Date of Birth: PII\n"
        "- Place of Birth: PII\n"
        "- Biometric Data: PII (fingerprints, facial recognition data,"
        " iris scans).\n"
        "- Medical Information: PII (health records, prescriptions).\n"
        "- Financial Information: PII (bank account, credit or debit card"
        " numbers).\n"
        "- Employment Information: PII (employment records, salary"
        " information).\n"
        "- Insurance Information: PII (policy numbers, claim"
        " information).\n"
        "- Education Records: PII (student records, transcripts).\n"
        "- Online Identifiers: PII (usernames, IP addresses, cookies, MAC"
        " addresses).\n"
        "- Photographs or Videos: PII (any media that can identify an"
        " individual).\n"
        "- National Identification Numbers: PII (national identifiers"
        " beyond SSN).\n"
        "- Geolocation Data: PII (GPS coordinates, location history).\n"
        "- Vehicle Registration Numbers: PII\n\n"
        "Not PII:\n\n"
        "Some data may look personally identifiable without being specific"
        " enough to identify an individual:\n\n"
        "- Standard 5-Digit Zip Code: Not PII\n"
        "- City: Not PII\n"
        "- State: Not PII\n"
        "- Country: Not PII\n"
        "- Age (in years): Not PII (unless combined with identifiers like"
        " date of birth).\n"
        "- Date or Timestamp (e.g. created_date, updated_timestamp): Not"
        " PII (unless combined with identifiers like date of birth).\n"
        "- Gender: Not PII\n"
        "- Ethnicity/Race: Not PII (general categories without further"
        " identifiers).\n"
        "- Publicly Available Information: Not PII (lawfully available"
        " government-record data).\n"
        "- Generic Job Titles: Not PII (\u201cManager\u201d,"
        " \u201cEngineer\u201d, without identifying detail).\n"
        "- Company/Organization Name: Not PII (without personal"
        " identifiers).\n\n"
        "Confidence Value: Provide a score between 0 and 1, rounded to two"
        " decimal places, for your confidence in the \u201cIs PII\u201d"
        " determination. 0.80 or higher counts as reasonably confident.\n\n"
        "Reason: Indicate why you made the decision you did.\n\n"
        "Output: Please ensure that your output is JSON and matches the"
        " structure of the output examples provided.\n\n"
        + _PII_EXAMPLES + "\n" + _CLOSING
    ),
}


def render(template: PromptTemplate, table_details_json: str, column_no: int, hints: str) -> str:
    """Substitute {new_json} / {column_no} / {hints} exactly as the
    reference renderer does (plain slot replacement -- the template
    body contains literal JSON braces, so str.format would mangle it;
    the reference substitutes the three slots the same way)."""
    return (
        _TEMPLATES[template]
        .replace("{hints}", hints)
        .replace("{new_json}", table_details_json)
        .replace("{column_no}", str(column_no))
    )
