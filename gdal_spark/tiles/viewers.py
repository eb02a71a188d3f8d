"""Viewer metadata sinks for tile pyramids.

The reference's tile pipeline emits Leaflet/OpenLayers HTML and KML
alongside the tiles (apps/gdalalg_raster_tile.cpp:1232+, KML per-tile
:508; gdal2tiles generate_leaflet/generate_kml). These are plain
string templates over the pyramid's extent/zoom metadata — driver-
side, negligible cost.
"""

from __future__ import annotations

from gdal_spark.tiles import tilemath as tm


def leaflet_html(
    title: str, z_min: int, z_max: int, center_lon: float, center_lat: float,
    tile_url: str = "./{z}/{x}/{y}.png",
) -> str:
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet/dist/leaflet.js"></script>
<style>html, body, #map {{ height: 100%; margin: 0; }}</style>
</head><body><div id="map"></div><script>
var map = L.map('map').setView([{center_lat}, {center_lon}], {z_min});
L.tileLayer('{tile_url}', {{
  minZoom: {z_min}, maxZoom: {z_max}, tms: false,
  attribution: '{title}'
}}).addTo(map);
</script></body></html>
"""


def tile_kml(z: int, x: int, y: int, tile_url: str | None = None) -> str:
    """Per-tile KML GroundOverlay with the tile's WGS84 bounds
    (gdalalg_raster_tile.cpp:508 GenerateKML analog)."""
    west, south, east, north = tm.tile_bounds_deg(z, x, y)
    href = tile_url or f"{z}/{x}/{y}.png"
    return f"""<?xml version="1.0" encoding="utf-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <Document>
    <name>{z}/{x}/{y}</name>
    <GroundOverlay>
      <Icon><href>{href}</href></Icon>
      <LatLonBox>
        <north>{north!r}</north><south>{south!r}</south>
        <east>{east!r}</east><west>{west!r}</west>
      </LatLonBox>
    </GroundOverlay>
  </Document>
</kml>
"""
