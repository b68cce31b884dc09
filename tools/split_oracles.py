#!/usr/bin/env python3
"""One-shot refactor: split the two oracle megafiles by family.

Moves the private CTE helpers of Oracles.scala / TextOracles.scala into
importable helper objects (OracleCtes / TextOracleCtes) and splits each
`val all: Map(...)` literal at an entry boundary into two objects, the
second half living in a new file. Entry bodies are copied byte-for-byte;
the gate proves the dumped oracle_sql.json is unchanged.
"""
import re
import sys

SRC = "src/main/scala/graft"


def split_file(path, obj_name, helpers_name, part2_name, part2_path):
    with open(path) as f:
        lines = f.readlines()

    # locate the object line and the `val all` line
    obj_i = next(i for i, l in enumerate(lines)
                 if l.startswith(f"object {obj_name}"))
    all_i = next(i for i, l in enumerate(lines)
                 if l.strip().startswith("val all: Map[String, String] = Map("))

    header = lines[:obj_i]  # package + scaladoc
    helpers = lines[obj_i + 1:all_i]
    body = lines[all_i:]

    # entry starts: 4-space-indented `"key" ->`
    entry_pat = re.compile(r'^    "([a-z0-9_]+)" ->')
    entry_idx = [i for i, l in enumerate(body) if entry_pat.match(l)]
    n = len(entry_idx)
    mid_entry = n // 2
    boundary = entry_idx[mid_entry]
    # pull preceding comment block into part2
    while boundary > 1 and body[boundary - 1].lstrip().startswith("//"):
        boundary -= 1
    part1_body = body[:boundary]
    part2_body = body[boundary:]
    keys1 = [entry_pat.match(body[i]).group(1) for i in entry_idx[:mid_entry]]
    keys2 = [entry_pat.match(body[i]).group(1) for i in entry_idx[mid_entry:]]

    # part1: rewrite the Map( opener to prepend part2, close with `)`
    part1_body[0] = part1_body[0].replace(
        "val all: Map[String, String] = Map(",
        f"val all: Map[String, String] = {part2_name}.all ++ Map(")
    # strip one trailing blank run, close the Map and the object
    while part1_body and part1_body[-1].strip() == "":
        part1_body.pop()
    part1_body.append("  )\n")

    # helper object: de-private the members (visibility via the
    # private[graft] object), keep docs
    helper_lines = []
    for l in helpers:
        helper_lines.append(l.replace("  private def ", "  def ")
                             .replace("  private val ", "  val "))
    while helper_lines and helper_lines[-1].strip() == "":
        helper_lines.pop()

    helpers_src = (
        "".join(lines[:next(i for i, l in enumerate(lines) if l.startswith('package')) + 1])
        + "\n"
        + f"/** Shared CTE/expression helpers for the split {obj_name} files\n"
        + "  * (one import point so entry bodies keep their bare helper\n"
        + "  * names byte-for-byte). */\n"
        + f"private[graft] object {helpers_name} {{\n"
        + "".join(helper_lines)
        + "}\n")

    main_src = (
        "".join(header)
        + f"object {obj_name} {{\n"
        + f"  import {helpers_name}._\n\n"
        + "".join(part1_body)
        + "}\n")

    part2_src = (
        "".join(lines[:next(i for i, l in enumerate(lines) if l.startswith('package')) + 1])
        + "\n"
        + f"/** Second half of [[{obj_name}]] (split r8 for file size; same\n"
        + "  * byte-identical oracle SQL, proven by the oracle_sql.json diff\n"
        + "  * at split time). */\n"
        + f"private[graft] object {part2_name} {{\n"
        + f"  import {helpers_name}._\n\n"
        + "".join(part2_body).rstrip("\n").rstrip("}").rstrip("\n") + "\n"
        + "}\n")

    with open(path, "w") as f:
        f.write(main_src)
    with open(f"{SRC}/{helpers_name}.scala", "w") as f:
        f.write(helpers_src)
    with open(part2_path, "w") as f:
        f.write(part2_src)
    print(f"{obj_name}: {n} entries -> {len(keys1)} + {len(keys2)}; "
          f"boundary key {keys2[0]}")


split_file(f"{SRC}/Oracles.scala", "Oracles", "OracleCtes",
           "OraclesB", f"{SRC}/OraclesB.scala")
split_file(f"{SRC}/TextOracles.scala", "TextOracles", "TextOracleCtes",
           "TextOraclesB", f"{SRC}/TextOraclesB.scala")
print("done")
