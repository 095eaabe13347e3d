// Native ini parser — the C++ equivalent of the reference's vendored
// iniparser 3.1 (lib/iniparser/src/iniparser.c, behavior re-implemented,
// not translated): "[section]" headers, "key = value" pairs addressed as
// "section:key", case-insensitive (keys lowercased on load and lookup),
// ';'/'#' inline comments, whitespace trimming.  Exposed through a plain C
// ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cctype>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct IniDict {
    std::unordered_map<std::string, std::string> map;
    std::vector<std::string> order;   // insertion order of keys
    std::string last_error;
};

std::string lower(std::string s) {
    std::transform(s.begin(), s.end(), s.begin(),
                   [](unsigned char c) { return std::tolower(c); });
    return s;
}

std::string strip(const std::string& s) {
    size_t a = s.find_first_not_of(" \t\r\n");
    if (a == std::string::npos) return "";
    size_t b = s.find_last_not_of(" \t\r\n");
    return s.substr(a, b - a + 1);
}

std::string strip_comment(const std::string& line) {
    size_t pos = std::string::npos;
    for (char marker : {';', '#'}) {
        size_t p = line.find(marker);
        if (p != std::string::npos && p < pos) pos = p;
    }
    return pos == std::string::npos ? line : line.substr(0, pos);
}

void set_key(IniDict* d, const std::string& key, const std::string& value) {
    std::string k = lower(strip(key));
    if (d->map.find(k) == d->map.end()) d->order.push_back(k);
    d->map[k] = value;
}

}  // namespace

extern "C" {

void* pinc_ini_new() { return new IniDict(); }

int pinc_ini_load(void* handle, const char* path) {
    auto* d = static_cast<IniDict*>(handle);
    std::ifstream in(path);
    if (!in) {
        d->last_error = std::string("cannot open ") + path;
        return -1;
    }
    std::string line, section;
    while (std::getline(in, line)) {
        line = strip(strip_comment(line));
        if (line.empty()) continue;
        if (line.front() == '[' && line.back() == ']') {
            section = lower(strip(line.substr(1, line.size() - 2)));
            continue;
        }
        size_t eq = line.find('=');
        if (eq == std::string::npos) continue;
        std::string key = line.substr(0, eq);
        std::string value = strip(line.substr(eq + 1));
        if (!section.empty()) key = section + ":" + strip(key);
        set_key(d, key, value);
    }
    return 0;
}

const char* pinc_ini_get(void* handle, const char* key) {
    auto* d = static_cast<IniDict*>(handle);
    auto it = d->map.find(lower(strip(key)));
    return it == d->map.end() ? nullptr : it->second.c_str();
}

void pinc_ini_set(void* handle, const char* key, const char* value) {
    set_key(static_cast<IniDict*>(handle), key, value);
}

long pinc_ini_nkeys(void* handle) {
    return static_cast<long>(static_cast<IniDict*>(handle)->order.size());
}

const char* pinc_ini_key_at(void* handle, long i) {
    auto* d = static_cast<IniDict*>(handle);
    if (i < 0 || i >= static_cast<long>(d->order.size())) return nullptr;
    return d->order[i].c_str();
}

const char* pinc_ini_error(void* handle) {
    return static_cast<IniDict*>(handle)->last_error.c_str();
}

void pinc_ini_free(void* handle) { delete static_cast<IniDict*>(handle); }

}  // extern "C"
