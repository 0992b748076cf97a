"""Sources: synthetic pages corpus + table IO with checkpoint/resume."""
