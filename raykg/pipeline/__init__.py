"""Ray Data pipelines: tagging, transcripts, graph construction, IO."""
