from .decode import XmlParseError, parse_osm_xml
