// DM3/DM4 (Gatan DigitalMicrograph) decoder — native fast path.
//
// Clean-room implementation of the tag-tree container format with the
// semantics of the reference MATLAB readers
// (DM3stoTIFs-batch/ReadDMFile.m:63-409, dmread.m, DM3Import.m): v3
// uint32 / v4 uint64 counts, big-endian tag headers, little- or
// big-endian data payloads, structs/strings/arrays, ImageList image
// extraction (data, dimensions, calibration scale/units, operation mode).
//
// C ABI (used by emx/io/dm_native.py via ctypes):
//   void* emx_dm_decode(const char* data, size_t len,
//                       char** meta_json, size_t* nbytes);
//     Parses the buffer; *meta_json receives a malloc'd JSON description
//     whose image entries carry BYTE OFFSETS into the original buffer,
//     so Python reads pixel data with numpy.frombuffer — the decoder
//     itself never copies pixels. Returns NULL (reserved).
//   void emx_dm_free(void* p, char* meta_json);
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x25252525;  // '%%%%'

struct ImageInfo {
  std::vector<uint64_t> dims;
  uint64_t data_offset = 0;
  uint64_t data_count = 0;
  int data_elem_type = 0;
  double scale = 1.0;
  std::string units;
  std::string name;
  std::string operation_mode;
  int gatan_data_type = -1;
  bool has_data = false;
};

struct Parser {
  const uint8_t* d;
  size_t len;
  size_t p = 0;
  int version = 3;
  bool data_le = true;
  bool ok = true;
  std::string error;

  // Current path context while walking the tree.
  std::vector<std::string> path;
  std::vector<ImageInfo> images;

  bool need(size_t n) {
    // p <= len is an invariant; compare against the remainder so a
    // file-controlled n cannot overflow p + n.
    if (n > len - p) {
      ok = false;
      if (error.empty()) {
        char buf[96];
        snprintf(buf, sizeof buf, "truncated file at offset %zu (need %zu)", p, n);
        error = buf;
      }
      return false;
    }
    return true;
  }

  uint8_t u8() {
    if (!need(1)) return 0;
    return d[p++];
  }
  uint16_t be16() {
    if (!need(2)) return 0;
    uint16_t v = (uint16_t(d[p]) << 8) | d[p + 1];
    p += 2;
    return v;
  }
  uint32_t be32() {
    if (!need(4)) return 0;
    uint32_t v = 0;
    for (int i = 0; i < 4; i++) v = (v << 8) | d[p + i];
    p += 4;
    return v;
  }
  uint64_t be64() {
    if (!need(8)) return 0;
    uint64_t v = 0;
    for (int i = 0; i < 8; i++) v = (v << 8) | d[p + i];
    p += 8;
    return v;
  }
  uint64_t llong() { return version == 3 ? be32() : be64(); }

  std::string str(size_t n) {
    if (!need(n)) return "";
    std::string s(reinterpret_cast<const char*>(d + p), n);
    p += n;
    return s;
  }

  static size_t elem_size(int t) {
    switch (t) {
      case 2: case 4: return 2;   // i16 / u16
      case 3: case 5: case 6: return 4;  // i32 / u32 / f32
      case 7: case 11: case 12: return 8;  // f64 / i64 / u64
      case 8: case 9: case 10: return 1;   // bool / char / i8
      default: return 0;
    }
  }

  double read_scalar(int t) {
    size_t n = elem_size(t);
    if (!need(n)) return 0.0;
    uint64_t raw = 0;
    if (data_le) {
      for (size_t i = 0; i < n; i++) raw |= uint64_t(d[p + i]) << (8 * i);
    } else {
      for (size_t i = 0; i < n; i++) raw = (raw << 8) | d[p + i];
    }
    p += n;
    switch (t) {
      case 2: return double(int16_t(raw));
      case 3: return double(int32_t(raw));
      case 4: return double(uint16_t(raw));
      case 5: return double(uint32_t(raw));
      case 6: { float f; uint32_t r32 = uint32_t(raw); memcpy(&f, &r32, 4); return f; }
      case 7: { double f; memcpy(&f, &raw, 8); return f; }
      case 8: case 10: return double(uint8_t(raw));
      case 9: return double(int8_t(raw));
      case 11: return double(int64_t(raw));
      case 12: return double(uint64_t(raw));
      default: return 0.0;
    }
  }

  // ---- path helpers ------------------------------------------------------
  bool in_image_entry(size_t* idx) const {
    // path like: ImageList / <n> / ...
    if (path.size() >= 2 && path[0] == "ImageList") {
      *idx = strtoull(path[1].c_str(), nullptr, 10);
      return *idx >= 1;
    }
    return false;
  }

  ImageInfo* image_for_path() {
    size_t idx;
    if (!in_image_entry(&idx)) return nullptr;
    // A real file cannot hold more images than bytes; cap the
    // label-derived index so a crafted label can't force a huge resize.
    if (idx > 4096 || idx > len) return nullptr;
    if (images.size() < idx) images.resize(idx);
    return &images[idx - 1];
  }

  bool path_tail_is(std::initializer_list<const char*> tail) const {
    if (path.size() < tail.size()) return false;
    size_t off = path.size() - tail.size();
    size_t i = 0;
    for (const char* t : tail) {
      if (path[off + i] != t) return false;
      ++i;
    }
    return true;
  }

  void record_value(double v, const std::string& s, bool is_string) {
    ImageInfo* im = image_for_path();
    if (!im) return;
    if (path_tail_is({"ImageData", "Calibrations", "Dimension", "1", "Scale"}))
      im->scale = v;
    else if (path_tail_is({"ImageData", "Calibrations", "Dimension", "1", "Units"}))
      im->units = s;
    else if (path.size() >= 2 && path[path.size() - 2] == "Dimensions")
      im->dims.push_back(uint64_t(v));
    else if (path_tail_is({"ImageData", "DataType"}))
      im->gatan_data_type = int(v);
    else if (path.size() == 3 && path[2] == "Name" && is_string)
      im->name = s;
    else if (path_tail_is({"Microscope Info", "Operation Mode"}) && is_string)
      im->operation_mode = s;
  }

  void record_array(uint64_t offset, uint64_t count, int elem_type) {
    ImageInfo* im = image_for_path();
    if (!im) return;
    if (path_tail_is({"ImageData", "Data"})) {
      im->data_offset = offset;
      im->data_count = count;
      im->data_elem_type = elem_type;
      im->has_data = true;
    } else if (path_tail_is({"ImageData", "Calibrations", "Dimension", "1",
                             "Units"}) && elem_type == 4) {
      // Units sometimes stored as uint16 (UTF-16) array.
      std::string s;
      for (uint64_t i = 0; i < count && offset + 2 * i + 1 < len; i++)
        s.push_back(char(d[offset + 2 * i]));
      im->units = s;
    }
  }

  // ---- grammar -----------------------------------------------------------
  void parse_struct_def(std::vector<int>* field_types) {
    llong();  // struct name length (names are empty in practice)
    uint64_t nfields = llong();
    if (nfields > 4096) { ok = false; error = "implausible struct"; return; }
    for (uint64_t i = 0; i < nfields && ok; i++) {
      llong();  // field name length
      field_types->push_back(int(llong()));
    }
  }

  void skip_struct_body(const std::vector<int>& field_types) {
    for (int t : field_types) {
      if (!elem_size(t)) { ok = false; error = "bad struct field type"; return; }
      read_scalar(t);
      if (!ok) return;
    }
  }

  void parse_typed() {
    uint64_t code = llong();
    if (!ok) return;
    if (elem_size(int(code))) {
      double v = read_scalar(int(code));
      record_value(v, "", false);
      return;
    }
    if (code == 15) {  // struct
      std::vector<int> fts;
      parse_struct_def(&fts);
      if (ok) skip_struct_body(fts);
      return;
    }
    if (code == 18) {  // string
      uint32_t n = be32();
      std::string s = str(n);
      record_value(0.0, s, true);
      return;
    }
    if (code == 20) {  // array
      uint64_t elem = llong();
      if (elem == 15) {
        std::vector<int> fts;
        parse_struct_def(&fts);
        uint64_t n = llong();
        for (uint64_t i = 0; i < n && ok; i++) skip_struct_body(fts);
        return;
      }
      uint64_t n = llong();
      size_t es = elem_size(int(elem));
      if (!es) { ok = false; error = "unsupported array elem type"; return; }
      if (n > (len - p) / es) {  // division avoids es*n u64 overflow
        ok = false;
        error = "array exceeds file size";
        return;
      }
      if (!need(es * n)) return;
      if (elem == 9) {
        record_value(0.0, std::string(reinterpret_cast<const char*>(d + p),
                                      size_t(n)), true);
      }
      record_array(p, n, int(elem));
      p += es * n;
      return;
    }
    ok = false;
    error = "unrecognized data type " + std::to_string(code);
  }

  void parse_data() {
    uint32_t magic = be32();
    if (magic != kMagic) { ok = false; error = "bad tag data magic"; return; }
    llong();  // definition length (stream is self-describing)
    parse_typed();
  }

  void parse_group() {
    u8();  // sorted
    u8();  // open
    uint64_t ntags = llong();
    if (ntags > 1u << 20) { ok = false; error = "implausible tag count"; return; }
    for (uint64_t i = 1; i <= ntags && ok; i++) {
      uint8_t kind = u8();
      uint16_t label_len = be16();
      std::string label = str(label_len);
      if (label.empty()) label = std::to_string(i);
      if (version == 4) be64();  // total bytes hint
      path.push_back(label);
      if (kind == 20) parse_group();
      else if (kind == 21) parse_data();
      else { ok = false; error = "unknown tag entry kind"; }
      path.pop_back();
    }
  }
};

const char* np_dtype(int elem_type, bool little) {
  const char* base;
  switch (elem_type) {
    case 2: base = "i2"; break;
    case 3: base = "i4"; break;
    case 4: base = "u2"; break;
    case 5: base = "u4"; break;
    case 6: base = "f4"; break;
    case 7: base = "f8"; break;
    case 8: case 10: base = "u1"; break;
    case 9: base = "i1"; break;
    case 11: base = "i8"; break;
    case 12: base = "u8"; break;
    default: base = "u1"; break;
  }
  static thread_local char buf[8];
  snprintf(buf, sizeof buf, "%c%s", little ? '<' : '>', base);
  return buf;
}

void json_escape(std::string* out, const std::string& s) {
  for (char c : s) {
    if (c == '"' || c == '\\') { out->push_back('\\'); out->push_back(c); }
    else if (uint8_t(c) >= 0x20) out->push_back(c);
  }
}

}  // namespace

extern "C" {

void* emx_dm_decode(const char* data, size_t len, char** meta_json,
                    size_t* nbytes) {
  *meta_json = nullptr;
  *nbytes = 0;
  std::string json;
  try {
  Parser ps{reinterpret_cast<const uint8_t*>(data), len};
  uint32_t version = ps.be32();
  if (version != 3 && version != 4) {
    json = "{\"error\": \"not a DM3/DM4 file\"}";
  } else {
    ps.version = int(version);
    ps.llong();  // total size
    ps.data_le = ps.be32() == 1;
    ps.parse_group();
    if (!ps.ok) {
      json = "{\"error\": \"";
      json_escape(&json, ps.error);
      json += "\"}";
    } else {
      json = "{\"version\": " + std::to_string(version) +
             ", \"data_le\": " + (ps.data_le ? "true" : "false") +
             ", \"images\": [";
      bool first = true;
      for (const ImageInfo& im : ps.images) {
        if (!im.has_data) continue;
        if (!first) json += ", ";
        first = false;
        json += "{\"offset\": " + std::to_string(im.data_offset) +
                ", \"count\": " + std::to_string(im.data_count) +
                ", \"dtype\": \"" + np_dtype(im.data_elem_type, ps.data_le) +
                "\", \"dims\": [";
        for (size_t i = 0; i < im.dims.size(); i++) {
          if (i) json += ", ";
          json += std::to_string(im.dims[i]);
        }
        json += "], \"scale\": " + std::to_string(im.scale) +
                ", \"units\": \"";
        json_escape(&json, im.units);
        json += "\", \"name\": \"";
        json_escape(&json, im.name);
        json += "\", \"operation_mode\": \"";
        json_escape(&json, im.operation_mode);
        json += "\"";
        if (im.gatan_data_type >= 0)
          json += ", \"gatan_data_type\": " + std::to_string(im.gatan_data_type);
        json += "}";
      }
      json += "]}";
    }
  }
  } catch (const std::exception& e) {
    // No C++ exception may escape the C ABI into the ctypes caller —
    // report as an error JSON instead (a crafted file could otherwise
    // raise bad_alloc/length_error and kill the harvest process).
    json = "{\"error\": \"decoder exception: ";
    json_escape(&json, e.what());
    json += "\"}";
  } catch (...) {
    json = "{\"error\": \"decoder exception\"}";
  }
  *meta_json = static_cast<char*>(malloc(json.size() + 1));
  if (*meta_json) memcpy(*meta_json, json.c_str(), json.size() + 1);
  return nullptr;
}

void emx_dm_free(void* p, char* meta_json) {
  free(p);
  free(meta_json);
}

}  // extern "C"
