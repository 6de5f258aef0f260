"""Explicit StructTypes for the CRM-shaped entities (SURVEY §1.4).

The reference consumes dynamic JSON with ``.get(key, default)`` everywhere
(/root/reference/modules/quote.py:206-228); our engine instead declares the
schema once per entity so Catalyst can prune columns and push filters.
``CUSTOMFIELDS`` and ``LINKS`` keep the reference's array-of-struct shape
(/root/reference/modules/quote.py:202, /root/reference/modules/task.py:157-168)
and are flattened at use sites with ``map_from_entries`` / higher-order
functions rather than per-row Python loops.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# array<struct<FIELD_NAME,FIELD_VALUE>> — quote.py:202 et al.
CUSTOMFIELDS_TYPE = ArrayType(
    StructType(
        [
            StructField("FIELD_NAME", StringType()),
            StructField("FIELD_VALUE", StringType()),
        ]
    )
)

# array<struct<LINK_OBJECT_NAME,LINK_OBJECT_ID>> — task.py:157-168
LINKS_TYPE = ArrayType(
    StructType(
        [
            StructField("LINK_OBJECT_NAME", StringType()),
            StructField("LINK_OBJECT_ID", LongType()),
        ]
    )
)


def _fields(*specs: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t) for n, t in specs])


# organisation.py:120-144; invoice.py:108-120
ORGANISATION_SCHEMA = _fields(
    ("ORGANISATION_ID", LongType()),
    ("ORGANISATION_NAME", StringType()),
    ("DATE_CREATED_UTC", StringType()),
    ("ADDRESS_BILLING_COUNTRY", StringType()),
    ("CUSTOMFIELDS", CUSTOMFIELDS_TYPE),
    ("LINKS", LINKS_TYPE),
)

# users.py:113-136
USER_SCHEMA = _fields(
    ("USER_ID", LongType()),
    ("CONTACT_ID", LongType()),
    ("FIRST_NAME", StringType()),
    ("LAST_NAME", StringType()),
    ("TIMEZONE_ID", StringType()),
    ("EMAIL_ADDRESS", StringType()),
    ("EMAIL_DROPBOX_IDENTIFIER", StringType()),
    ("EMAIL_DROPBOX_ADDRESS", StringType()),
    ("ADMINISTRATOR", BooleanType()),
    ("ACCOUNT_OWNER", BooleanType()),
    ("ACTIVE", BooleanType()),
    ("DATE_CREATED_UTC", StringType()),
    ("DATE_UPDATED_UTC", StringType()),
    ("USER_CURRENCY", StringType()),
    ("CONTACT_DISPLAY", StringType()),
    ("CONTACT_ORDER", StringType()),
    ("TASK_WEEK_START", LongType()),
    ("INSTANCE_ID", LongType()),
    ("PROFILE_ID", LongType()),
    ("ROLE_ID", LongType()),
)

# quote.py:201-232
QUOTATION_SCHEMA = _fields(
    ("QUOTE_ID", LongType()),
    ("QUOTATION_NUMBER", StringType()),
    ("QUOTE_STATUS", StringType()),
    ("QUOTATION_NAME", StringType()),
    ("SUBTOTAL", DoubleType()),
    ("TOTAL_PRICE", DoubleType()),
    ("GRAND_TOTAL", DoubleType()),
    ("QUOTATION_EXPIRATION_DATE", StringType()),
    ("ADDRESS_BILLING_COUNTRY", StringType()),
    ("ADDRESS_SHIPPING_COUNTRY", StringType()),
    ("QUOTATION_CURRENCY_CODE", StringType()),
    ("DISCOUNT", DoubleType()),
    ("ORGANISATION_ID", LongType()),
    ("ORGANISATION_NAME", StringType()),
    ("OPPORTUNITY_ID", LongType()),
    ("OPPORTUNITY_NAME", StringType()),
    ("DATE_CREATED_UTC", StringType()),
    ("DATE_UPDATED_UTC", StringType()),
    ("CUSTOMFIELDS", CUSTOMFIELDS_TYPE),
)

# contact — quote.py:122-131 (sales person), task.py:190-193
CONTACT_SCHEMA = _fields(
    ("CONTACT_ID", LongType()),
    ("FIRST_NAME", StringType()),
    ("LAST_NAME", StringType()),
)

# opportunity.py:183-243
OPPORTUNITY_SCHEMA = _fields(
    ("OPPORTUNITY_ID", LongType()),
    ("OPPORTUNITY_NAME", StringType()),
    ("OPPORTUNITY_DETAILS", StringType()),
    ("ORGANISATION_ID", LongType()),
    ("OWNER_USER_ID", LongType()),
    ("STAGE_ID", LongType()),
    ("PRICEBOOK_ID", LongType()),
    ("STATE_REASON_ID", LongType()),
    ("OPPORTUNITY_STATE", StringType()),
    ("OPPORTUNITY_VALUE", DoubleType()),
    ("BID_CURRENCY", StringType()),
    ("PROBABILITY", DoubleType()),
    ("DATE_CREATED_UTC", StringType()),
    ("FORECAST_CLOSE_DATE", StringType()),
    ("ACTUAL_CLOSE_DATE", StringType()),
    ("LAST_ACTIVITY_DATE_UTC", StringType()),
    ("NEXT_ACTIVITY_DATE_UTC", StringType()),
    ("CUSTOMFIELDS", CUSTOMFIELDS_TYPE),
)

PIPELINE_STAGE_SCHEMA = _fields(
    ("STAGE_ID", LongType()), ("STAGE_NAME", StringType())
)
PRICEBOOK_SCHEMA = _fields(("PRICEBOOK_ID", LongType()), ("NAME", StringType()))
PRODUCT_SCHEMA = _fields(
    ("PRODUCT_ID", LongType()), ("PRODUCT_FAMILY", StringType())
)
PRICEBOOK_ENTRY_SCHEMA = _fields(
    ("PRICEBOOK_ENTRY_ID", LongType()), ("PRODUCT_ID", LongType())
)
OPPORTUNITY_LINE_ITEM_SCHEMA = _fields(
    ("OPPORTUNITY_ID", LongType()), ("PRICEBOOK_ENTRY_ID", LongType())
)
# opportunity.py:105-112 — link rows (OBJECT_NAME='Opportunity')
OPPORTUNITY_LINK_SCHEMA = _fields(
    ("OBJECT_NAME", StringType()),
    ("OBJECT_ID", LongType()),
    ("LINK_OBJECT_NAME", StringType()),
    ("LINK_OBJECT_ID", LongType()),
)
OPPORTUNITY_STATE_REASON_SCHEMA = _fields(
    ("STATE_REASON_ID", LongType()), ("STATE_REASON", StringType())
)

# task.py:141-267
TASK_SCHEMA = _fields(
    ("TASK_ID", LongType()),
    ("TITLE", StringType()),
    ("CATEGORY_ID", LongType()),
    ("OWNER_USER_ID", LongType()),
    ("RESPONSIBLE_USER_ID", LongType()),
    ("STATUS", StringType()),
    ("DETAILS", StringType()),
    ("PERCENT_COMPLETE", DoubleType()),
    ("PRIORITY", LongType()),
    ("ASSIGNED_TEAM_ID", LongType()),
    ("PUBLICLY_VISIBLE", BooleanType()),
    ("COMPLETED", BooleanType()),
    ("ASSIGNED_DATE_UTC", StringType()),
    ("DATE_CREATED_UTC", StringType()),
    ("REMINDER_DATE_UTC", StringType()),
    ("DUE_DATE", StringType()),
    ("COMPLETED_DATE_UTC", StringType()),
    ("LINKS", LINKS_TYPE),
)

TASK_CATEGORY_SCHEMA = _fields(
    ("CATEGORY_ID", LongType()), ("CATEGORY_NAME", StringType())
)
LEAD_SCHEMA = _fields(
    ("LEAD_ID", LongType()),
    ("FIRST_NAME", StringType()),
    ("LAST_NAME", StringType()),
)
PROJECT_SCHEMA = _fields(
    ("PROJECT_ID", LongType()), ("PROJECT_NAME", StringType())
)
NOTE_SCHEMA = _fields(("NOTE_ID", LongType()), ("TITLE", StringType()))

# equiment.py:136-168 — custom object Equipment__c
EQUIPMENT_SCHEMA = _fields(
    ("RECORD_ID", LongType()),
    ("RECORD_NAME", StringType()),
    ("OWNER_USER_ID", LongType()),
    ("DATE_CREATED_UTC", StringType()),
    ("DATE_UPDATED_UTC", StringType()),
    ("CUSTOMFIELDS", CUSTOMFIELDS_TYPE),
)

# invoice.py:162-206 — custom object Invoice_History__c
INVOICE_SCHEMA = _fields(
    ("RECORD_ID", LongType()),
    ("RECORD_NAME", StringType()),
    ("OWNER_USER_ID", LongType()),
    ("DATE_CREATED_UTC", StringType()),
    ("CUSTOMFIELDS", CUSTOMFIELDS_TYPE),
)

# opportunity_stage.py:131-173 — mail-ingest analog
MAIL_MESSAGE_SCHEMA = _fields(
    ("message_id", StringType()),
    ("receivedDateTime", StringType()),
    ("sender_address", StringType()),
    ("subject", StringType()),
    ("body_html", StringType()),
)
