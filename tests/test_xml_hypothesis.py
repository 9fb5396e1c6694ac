"""Property-based check of read_xml_records: random record batches run
through ElementTree serialization must round-trip exactly through the
distributed reader — scalar fields (text and attributes), missing
elements as nulls, and repeated-children list fields with slot-preserving
alignment."""

import xml.etree.ElementTree as ET

from hypothesis import given, settings, strategies as st

text_value = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=" _-."
    ),
    min_size=1,
    max_size=20,
).map(str.strip).filter(bool)

record = st.fixed_dictionaries(
    {
        "rid": text_value,          # attribute on the record
        "name": st.one_of(st.none(), text_value),   # optional child text
        "items": st.lists(st.one_of(st.none(), text_value), max_size=4),
    }
)


@settings(max_examples=8, deadline=None)
@given(st.lists(record, min_size=1, max_size=10))
def test_xml_reader_roundtrip(records):
    from orion_spark.session import get_spark
    from orion_spark.sources.readers import read_xml_records

    spark = get_spark(app_name="hypothesis-xml", shuffle_partitions=8)

    root = ET.Element("root")
    for rec in records:
        e = ET.SubElement(root, "entry", id=rec["rid"])
        if rec["name"] is not None:
            ET.SubElement(e, "name").text = rec["name"]
        wrap = ET.SubElement(e, "items")
        for it in rec["items"]:
            child = ET.SubElement(wrap, "item")
            if it is not None:
                child.text = it
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "data.xml")
        ET.ElementTree(root).write(path, encoding="unicode")
        out = read_xml_records(
            spark,
            path,
            "entry",
            {"rid": "@id", "name": "name"},
            list_fields={"items": ("items/item", ".")},
        ).collect()

    def key(t):  # None-safe total order for sorting rows
        return (t[0], t[1] or "", [x or "" for x in t[2]])

    got = sorted(
        (
            (r.rid, r.name, list(r.items) if r.items is not None else [])
            for r in out
        ),
        key=key,
    )
    # ElementTree text for an empty element is None -> slot preserved as null
    want = sorted(
        ((rec["rid"], rec["name"], rec["items"]) for rec in records), key=key
    )
    assert got == want
