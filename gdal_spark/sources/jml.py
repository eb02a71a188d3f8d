"""JML (OpenJUMP) vector format.

Semantics re-derived from the reference driver
(/root/reference/ogr/ogrsf_frmts/jml/): a JCSDataset document with a
JCSGMLInputTemplate declaring column bindings
(<column><name>..<type>..<valueElement elementName="property"
attributeName="name" .../>), then a <featureCollection> of
<feature> elements each holding <geometry> (GML 2 geometry) and
<property name="...">value</property> children.

The writer emits one <feature> per line (streamed single-file
sink); the reader scans lines DISTRIBUTED, rebinding the gml
namespace per line (sources/gpx.py xmlns gotcha), and reuses the
GML ring parser."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gdal_spark.geo import wkb as wkbmod
from gdal_spark.sources.gml import GML_NS, _geom_to_gml, _parse_coords

__all__ = ["write_jml", "read_jml"]

_JML_TYPES = {"bigint": "INTEGER", "int": "INTEGER",
              "double": "DOUBLE", "string": "STRING"}


def _esc(v) -> str:
    return (
        str(v).replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def write_jml(df: DataFrame, path: str,
              geom_col: str = "geometry") -> None:
    import os

    attrs = [f for f in df.schema.fields if f.name != geom_col]
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write("<JCSDataset>\n<JCSGMLInputTemplate>\n")
        f.write("<CollectionElement>featureCollection</CollectionElement>\n")
        f.write("<FeatureElement>feature</FeatureElement>\n")
        f.write("<GeometryElement>geometry</GeometryElement>\n")
        f.write("<ColumnDefinitions>\n")
        for a in attrs:
            t = _JML_TYPES.get(a.dataType.simpleString(), "STRING")
            f.write(
                "<column><name>%s</name><type>%s</type>"
                '<valueElement elementName="property" '
                'attributeName="name" attributeValue="%s"/>'
                '<valueLocation position="body"/></column>\n'
                % (a.name, t, a.name)
            )
        f.write("</ColumnDefinitions>\n</JCSGMLInputTemplate>\n")
        f.write("<featureCollection>\n")
        for row in df.toLocalIterator():
            props = "".join(
                f'<property name="{a.name}">{_esc(row[a.name])}</property>'
                for a in attrs
                if row[a.name] is not None
            )
            f.write(
                "<feature><geometry>"
                + _geom_to_gml(row[geom_col])
                + f"</geometry>{props}</feature>\n"
            )
        f.write("</featureCollection>\n</JCSDataset>\n")
    os.replace(tmp, path)


def read_jml(spark: SparkSession, path: str,
             attr_schema: str) -> DataFrame:
    attrs = T._parse_datatype_string(attr_schema)
    schema = T.StructType(
        list(attrs.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    names = [f.name for f in attrs.fields]
    casts = {f.name: f.dataType.simpleString() for f in attrs.fields}
    gn = "{%s}" % GML_NS

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for line in pdf["value"]:
                s = str(line).strip()
                if not s.startswith("<feature>"):
                    continue
                # rebind gml: per line (distributed single-line parse
                # loses the document's namespace declarations)
                elem = ET.fromstring(
                    f'<w xmlns:gml="{GML_NS}">{s}</w>'
                )[0]
                rec = {n: None for n in names}
                for pr in elem.findall("property"):
                    n = pr.get("name")
                    if n in rec and pr.text is not None:
                        v = pr.text
                        if casts[n] in ("bigint", "int"):
                            rec[n] = int(v)
                        elif casts[n] in ("double", "float"):
                            rec[n] = float(v)
                        else:
                            rec[n] = v
                geom = elem.find("geometry")
                polys = []
                for poly in geom.iter(f"{gn}Polygon"):
                    rings = [
                        _parse_coords(
                            poly.find(
                                f"{gn}outerBoundaryIs/{gn}LinearRing/"
                                f"{gn}coordinates"
                            ).text
                        )
                    ]
                    for inner in poly.findall(
                        f"{gn}innerBoundaryIs/{gn}LinearRing/"
                        f"{gn}coordinates"
                    ):
                        rings.append(_parse_coords(inner.text))
                    polys.append(rings)
                if not polys:
                    raise ValueError("jml: feature without polygon")
                rec["geometry"] = (
                    wkbmod.wkb_polygon(polys[0])
                    if len(polys) == 1
                    else wkbmod.wkb_multipolygon(polys)
                )
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=[f.name for f in schema.fields]
            )

    return spark.read.text(path).mapInPandas(decode, schema)
