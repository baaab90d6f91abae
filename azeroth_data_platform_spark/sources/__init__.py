"""Sources & sinks: file readers/writers, merge semantics, retention, REST edge."""
