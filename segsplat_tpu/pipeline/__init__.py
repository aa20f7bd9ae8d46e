"""Stage pipeline — the reference's subprocess-glued stage CLIs rebuilt as
importable in-process functions (SURVEY §7 layer 4), each still emitting the
reference's artifact files so the CLIs stay drop-in compatible."""
