"""One-time extractor: reference Go proto-literal scenes → .pbtxt assets.

The reference's built-in scene library (internal/scenes/{scenes,pbr,spectral,
water}.go) mostly builds `&pb_transport.Scene{...}` composite literals — pure
data in Go syntax. This script parses those literals (NOT the Go code — the
loops/OBJ-loading scenes are skipped and reimplemented in Python) and emits
protobuf text-format files under izpi_tpu/scene/library/data/, which
izpi_tpu.scene.pbtxt.load_scene consumes. That keeps the scene *data*
byte-identical to the reference for parity testing while the code path is
entirely ours.

Run from the repo root:  python scripts/extract_go_scenes.py
"""

from __future__ import annotations

import os
import re
import sys

REF = "/root/reference/internal/scenes"
OUT = os.path.join(os.path.dirname(__file__), "..", "izpi_tpu", "scene",
                   "library", "data")

_CAMEL = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")

# Function names where acronym runs defeat the camel→snake regex.
_RENAME = {
    "CornellBoxPBRRGB": "cornell_box_pbr_rgb",
    "CornellBoxPBRSpectral": "cornell_box_pbr_spectral",
    "CornellBoxPBRColouredGlassSpectral":
        "cornell_box_pbr_coloured_glass_spectral",
    "CornellBoxPB": "cornell_box_pb",
    "CornellBoxRGB": "cornell_box_rgb",
}


def snake(name: str) -> str:
    if name in _RENAME:
        return _RENAME[name]
    return _CAMEL.sub("_", name).lower()


# ---------------------------------------------------------------------------
# Go composite-literal tokenizer / parser
# ---------------------------------------------------------------------------

_GO_TOKEN = re.compile(r"""
    \s*(?:
      (?P<comment>//[^\n]*|/\*.*?\*/)
    | (?P<string>"(?:[^"\\]|\\.)*")
    | (?P<number>-?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
    | (?P<punct>[{}\[\](),:&*])
    | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    )""", re.X | re.S)


def tokenize(src: str):
    pos = 0
    out = []
    while pos < len(src):
        m = _GO_TOKEN.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"go tokenize error at {src[pos:pos+60]!r}")
        pos = m.end()
        if m.lastgroup == "comment":
            continue
        out.append((m.lastgroup, m.group(m.lastgroup)))
    return out


class GoParser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        kind, v = self.next()
        if v != val:
            raise ValueError(f"expected {val!r}, got {v!r} (kind {kind})")

    def parse_value(self):
        kind, val = self.peek()
        if val == "&":
            self.next()
            return self.parse_value()
        if kind == "string":
            self.next()
            return val[1:-1].encode().decode("unicode_escape")
        if kind == "number":
            self.next()
            return float(val)
        if val == "{":  # bare element literal inside a slice
            self.next()
            return self.parse_struct_body()
        if kind == "ident" and val == "map":
            self.next()
            self.expect("[")
            self.next()  # string
            self.expect("]")
            k2, v2 = self.next()
            if v2 == "*":
                self.next()
            self.expect("{")
            return self.parse_map_body()
        if kind == "ident":
            self.next()
            name = val
            if self.peek()[1] == "(" and name not in ("float32", "float64"):
                # e.g. materials.CreatePorcelainProtobufMaterial() — consume
                # the call and return a marker resolved in convert().
                depth = 0
                while True:
                    _, v2 = self.next()
                    if v2 == "(":
                        depth += 1
                    elif v2 == ")":
                        depth -= 1
                        if depth == 0:
                            break
                return {"__call__": name}
            if name == "float32" or name == "float64":
                # float32(aspect) / float32(1.78)
                self.expect("(")
                k2, v2 = self.next()
                inner = 1.0 if k2 == "ident" else float(v2)
                self.expect(")")
                return inner
            if name in ("true", "false"):
                return name == "true"
            nkind, nval = self.peek()
            if nval == "{":
                self.next()
                return self.parse_struct_body()
            if nval == "[":
                # map[string]*T{...}
                raise ValueError("unexpected [ after ident")
            # plain identifier: enum like pb_transport.TextureType_IMAGE
            last = name.split(".")[-1]
            if "_" in last:
                return last.split("_", 1)[1]
            return last
        if val == "[":
            # []*pb_transport.T{...} or []float32{...}
            self.next()
            self.expect("]")
            k2, v2 = self.next()
            if v2 == "*":
                k2, v2 = self.next()  # type ident
            self.expect("{")
            return self.parse_slice_body()
        if val == "map":
            self.next()
            self.expect("[")
            self.next()  # string
            self.expect("]")
            k2, v2 = self.next()
            if v2 == "*":
                self.next()
            self.expect("{")
            return self.parse_map_body()
        raise ValueError(f"unexpected value token {kind} {val}")

    def parse_struct_body(self):
        out = {}
        while True:
            kind, val = self.peek()
            if val == "}":
                self.next()
                return out
            if val == ",":
                self.next()
                continue
            if kind != "ident":
                raise ValueError(f"expected field, got {kind} {val}")
            self.next()
            self.expect(":")
            out[val] = self.parse_value()

    def parse_slice_body(self):
        out = []
        while True:
            kind, val = self.peek()
            if val == "}":
                self.next()
                return out
            if val == ",":
                self.next()
                continue
            out.append(self.parse_value())

    def parse_map_body(self):
        out = {}
        while True:
            kind, val = self.peek()
            if val == "}":
                self.next()
                return out
            if val == ",":
                self.next()
                continue
            if kind != "string":
                raise ValueError(f"expected map key, got {kind} {val}")
            self.next()
            key = val[1:-1]
            self.expect(":")
            out[key] = self.parse_value()


# ---------------------------------------------------------------------------
# Go dict → proto-text tree (snake_case keys, oneofs spliced)
# ---------------------------------------------------------------------------


def _porcelain_material() -> dict:
    """Literal equivalent of materials.CreatePorcelainProtobufMaterial()
    (internal/materials/materials.go:142-174): Lambert with the porcelain
    tabulated spectral albedo."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from izpi_tpu.materials.presets import PORCELAIN_REFLECTANCE
    from izpi_tpu.spectral.cie import CIE_WAVELENGTHS

    return {
        "name": "Porcelain",
        "type": "LAMBERT",
        "lambert": {
            "spectral_albedo": {
                "tabulated": {
                    "wavelengths": [float(w) for w in CIE_WAVELENGTHS],
                    "values": [float(v) for v in PORCELAIN_REFLECTANCE],
                }
            }
        },
    }


_CALLS = {
    "materials.CreatePorcelainProtobufMaterial": _porcelain_material,
}


def convert(node):
    if isinstance(node, dict):
        if set(node) == {"__call__"}:
            fn = _CALLS.get(node["__call__"])
            if fn is None:
                raise ValueError(f"unsupported call {node['__call__']}")
            return fn()
        out = {}
        for k, v in node.items():
            if k.endswith("Properties") and isinstance(v, dict) and len(v) == 1:
                inner_k, inner_v = next(iter(v.items()))
                out[snake(inner_k)] = convert(inner_v)
            else:
                out[snake(k)] = convert(v)
        return out
    if isinstance(node, list):
        return [convert(x) for x in node]
    return node


def emit_pbtxt(tree, indent=0) -> str:
    pad = "  " * indent
    lines = []
    for k, v in tree.items():
        for item in (v if isinstance(v, list) else [v]):
            if isinstance(item, dict):
                lines.append(f"{pad}{k} {{")
                lines.append(emit_pbtxt(item, indent + 1))
                lines.append(pad + "}")
            elif isinstance(item, bool):
                lines.append(f"{pad}{k}: {'true' if item else 'false'}")
            elif isinstance(item, float):
                s = repr(item)
                if s.endswith(".0"):
                    s = s[:-2]
                lines.append(f"{pad}{k}: {s}")
            else:
                esc = str(item).replace("\\", "\\\\").replace('"', '\\"')
                lines.append(f'{pad}{k}: "{esc}"')
    return "\n".join(lines)


def map_to_entries(tree):
    """proto map fields → repeated {key value} entries like real pbtxt."""
    for field in ("materials", "image_textures", "displacement_maps"):
        if field in tree and isinstance(tree[field], dict):
            tree[field] = [
                {"key": k, "value": v} for k, v in tree[field].items()
            ]
    return tree


def extract_file(path):
    src = open(path).read()
    scenes = {}
    for m in re.finditer(r"func (\w+)\(", src):
        fname = m.group(1)
        # literal start: first `&pb_transport.Scene{` after the func
        lit = src.find("&pb_transport.Scene{", m.end())
        nxt = re.search(r"func \w+\(", src[m.end():])
        fend = m.end() + nxt.start() if nxt else len(src)
        if lit == -1 or lit >= fend:
            continue
        # Cut at the literal's balanced closing brace so trailing Go
        # statements (append loops etc., e.g. the dragon scene) don't
        # confuse the tokenizer.
        depth = 0
        j = src.index("{", lit)
        k = j
        while k < fend:
            c = src[k]
            if c == '"':
                k += 1
                while src[k] != '"' or src[k - 1] == "\\":
                    k += 1
            elif src.startswith("//", k):
                k = src.index("\n", k)
            elif c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        body = src[lit:k + 1]
        try:
            toks = tokenize(body)
            p = GoParser(toks)
            p.expect("&")
            p.next()  # pb_transport.Scene
            p.expect("{")
            raw = p.parse_struct_body()
        except ValueError as e:
            print(f"  SKIP {fname}: {e}")
            continue
        scenes[fname] = map_to_entries(convert(raw))
    return scenes


def main():
    os.makedirs(OUT, exist_ok=True)
    total = 0
    for f in ("scenes.go", "pbr.go", "spectral.go", "water.go"):
        path = os.path.join(REF, f)
        scenes = extract_file(path)
        for fname, tree in scenes.items():
            out_path = os.path.join(OUT, snake(fname) + ".pbtxt")
            with open(out_path, "w") as fh:
                fh.write(f"# Extracted from reference internal/scenes/{f} "
                         f"func {fname} (proto literal → text format).\n")
                fh.write(emit_pbtxt(tree))
                fh.write("\n")
            n_tri = len(tree.get("objects", {}).get("triangles", []) or [])
            n_sph = len(tree.get("objects", {}).get("spheres", []) or [])
            print(f"{snake(fname)}.pbtxt: {n_tri} tris, {n_sph} spheres, "
                  f"{len(tree.get('materials', []))} materials")
            total += 1
    print(f"extracted {total} scenes → {os.path.normpath(OUT)}")


if __name__ == "__main__":
    sys.exit(main())
