"""Sources / sinks: fixed-width geo-epic file formats as batch transforms,
plus the documents corpus reader/writer."""
