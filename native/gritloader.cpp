// gritloader — native host-side training data pipeline.
//
// The reference feeds its trainer from a Python Dataset/Collator/Sampler
// stack (gritlm/training/data.py) on the accelerator host. On TPU the input
// pipeline must overlap with device compute or the MXU starves between
// steps, so this C++ loader does the whole host path off the GIL:
//
//   JSONL parse → pos/neg sampling (train_group_size) → GritLM template
//   formatting → byte-level tokenization → fixed-shape int32 batch packing
//   → homogeneous-batch order (single-source batches, mixed leftovers)
//   → background prefetch thread + bounded queue.
//
// Semantics mirror gritlm_tpu/training/{templates,data}.py exactly for the
// ByteTokenizer path (ids: 0-255 = utf-8 bytes, 256 = <s>, 257 = </s> = pad;
// literal "<s>"/"</s>" in templates map to the special ids). Python binds
// via ctypes (gritlm_tpu/training/native_loader.py); a pytest checks C++
// batches against the Python collator token-for-token.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no external deps)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal JSON parser (objects, arrays, strings, numbers, bool/null) —
// just enough for the training JSONL format contract.

struct JsonValue {
  enum Type { STR, ARR, OBJ, NUM, BOOL, NUL } type = NUL;
  std::string str;
  double num = 0;
  bool boolean = false;
  std::vector<JsonValue> arr;
  std::vector<std::pair<std::string, JsonValue>> obj;

  const JsonValue* get(const std::string& key) const {
    for (auto& kv : obj)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
};

struct JsonParser {
  const char* p;
  const char* end;
  bool ok = true;

  explicit JsonParser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  void skip() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool consume(char c) {
    skip();
    if (p < end && *p == c) { p++; return true; }
    return false;
  }
  JsonValue parse() {
    skip();
    JsonValue v;
    if (p >= end) { ok = false; return v; }
    char c = *p;
    if (c == '"') return parse_string();
    if (c == '{') return parse_object();
    if (c == '[') return parse_array();
    if (c == 't' || c == 'f') return parse_bool();
    if (c == 'n') { p += 4; v.type = JsonValue::NUL; return v; }
    return parse_number();
  }
  JsonValue parse_string() {
    JsonValue v; v.type = JsonValue::STR;
    p++;  // opening quote
    std::string& out = v.str;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        p++;
        switch (*p) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case '/': out += '/'; break;
          case '\\': out += '\\'; break;
          case '"': out += '"'; break;
          case 'u': {
            if (p + 4 < end) {
              unsigned cp = std::stoul(std::string(p + 1, p + 5), nullptr, 16);
              p += 4;
              // utf-8 encode (surrogate pairs for >BMP)
              if (cp >= 0xD800 && cp <= 0xDBFF && p + 6 < end && p[1] == '\\' &&
                  p[2] == 'u') {
                unsigned lo = std::stoul(std::string(p + 3, p + 7), nullptr, 16);
                cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00);
                p += 6;
              }
              if (cp < 0x80) out += (char)cp;
              else if (cp < 0x800) {
                out += (char)(0xC0 | (cp >> 6));
                out += (char)(0x80 | (cp & 0x3F));
              } else if (cp < 0x10000) {
                out += (char)(0xE0 | (cp >> 12));
                out += (char)(0x80 | ((cp >> 6) & 0x3F));
                out += (char)(0x80 | (cp & 0x3F));
              } else {
                out += (char)(0xF0 | (cp >> 18));
                out += (char)(0x80 | ((cp >> 12) & 0x3F));
                out += (char)(0x80 | ((cp >> 6) & 0x3F));
                out += (char)(0x80 | (cp & 0x3F));
              }
            }
            break;
          }
          default: out += *p;
        }
        p++;
      } else {
        out += *p++;
      }
    }
    if (p < end) p++;  // closing quote
    return v;
  }
  JsonValue parse_object() {
    JsonValue v; v.type = JsonValue::OBJ;
    p++;
    skip();
    if (consume('}')) return v;
    while (p < end) {
      skip();
      JsonValue key = parse_string();
      consume(':');
      v.obj.emplace_back(key.str, parse());
      if (!consume(',')) break;
    }
    consume('}');
    return v;
  }
  JsonValue parse_array() {
    JsonValue v; v.type = JsonValue::ARR;
    p++;
    skip();
    if (consume(']')) return v;
    while (p < end) {
      v.arr.push_back(parse());
      if (!consume(',')) break;
    }
    consume(']');
    return v;
  }
  JsonValue parse_bool() {
    JsonValue v; v.type = JsonValue::BOOL;
    if (*p == 't') { v.boolean = true; p += 4; } else { v.boolean = false; p += 5; }
    return v;
  }
  JsonValue parse_number() {
    JsonValue v; v.type = JsonValue::NUM;
    char* out;
    v.num = strtod(p, &out);
    p = out;
    return v;
  }
};

// ---------------------------------------------------------------------------
// Byte tokenizer (matches gritlm_tpu.tokenizer.ByteTokenizer)

constexpr int32_t BOS_ID = 256;
constexpr int32_t EOS_ID = 257;
constexpr int32_t PAD_ID = 257;
constexpr int64_t IGNORE = -100;

void tokenize_into(const std::string& text, std::vector<int32_t>& out) {
  size_t i = 0, n = text.size();
  while (i < n) {
    if (text.compare(i, 3, "<s>") == 0) {
      out.push_back(BOS_ID);
      i += 3;
    } else if (text.compare(i, 4, "</s>") == 0) {
      out.push_back(EOS_ID);
      i += 4;
    } else {
      out.push_back((int32_t)(uint8_t)text[i]);
      i += 1;
    }
  }
}

// ---------------------------------------------------------------------------
// Templates (gritlm_tpu/training/templates.py constants)

const std::string BASE_BOS = "<s>";
const std::string TURN_SEP = "\n";
const std::string USER_BOS = "<|user|>\n";
const std::string USER_EOS = "";
const std::string EMBED_BOS = "\n<|embed|>\n";
const std::string EMBED_BOS_LSTRIP = "<|embed|>\n";
const std::string ASSISTANT_BOS = "\n<|assistant|>\n";
const std::string ASSISTANT_EOS = "</s>";

std::string strip_instruction(const std::string& s) {
  const std::string chars = "\t\n :";
  size_t a = s.find_first_not_of(chars);
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(chars);
  return s.substr(a, b - a + 1);
}

std::string rstrip(const std::string& s) {
  size_t b = s.find_last_not_of(" \t\n\r");
  return b == std::string::npos ? "" : s.substr(0, b + 1);
}
std::string lstrip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\n\r");
  return a == std::string::npos ? "" : s.substr(a);
}

// (full_prompt, prefix) for an embedding sample
void format_embed(const std::string& instruction, const std::string& text,
                  std::string& full, std::string& prefix) {
  std::string instr = strip_instruction(instruction);
  if (!instr.empty())
    prefix = BASE_BOS + USER_BOS + instr + USER_EOS + EMBED_BOS;
  else
    prefix = BASE_BOS + EMBED_BOS_LSTRIP;
  full = prefix + text;
}

// ---------------------------------------------------------------------------
// Samples

struct EmbSample {
  std::string q_instr, q_text;
  std::vector<std::pair<std::string, std::string>> pos;  // (instr, text)
  std::vector<std::pair<std::string, std::string>> neg;
};

struct GenSample {
  std::vector<std::string> turns;  // user, assistant, ...
};

struct Batch {
  std::vector<int32_t> q_ids, q_mask, q_il;
  std::vector<int32_t> p_ids, p_mask, p_il;
  std::vector<int32_t> g_ids, g_mask;
  std::vector<int64_t> g_labels;
  int g_count = 0;
};

std::pair<std::string, std::string> parse_pair(const JsonValue& v) {
  if (v.type == JsonValue::STR) return {"", v.str};
  if (v.type == JsonValue::ARR && v.arr.size() >= 2)
    return {v.arr[0].str, v.arr[1].str};
  return {"", ""};
}

// ---------------------------------------------------------------------------
// Loader

struct Loader {
  // config
  int batch_size, group_size, qlen, plen, glen, take_nth, prefetch_depth;
  uint64_t seed;
  size_t max_char_len;

  // data: one vector per source file (homogeneous batching needs sources)
  std::vector<std::vector<EmbSample>> emb_sets;
  std::vector<GenSample> gen;
  size_t len_emb = 0;

  // epoch state
  std::vector<std::vector<int>> batches;  // indices into flattened emb space
  std::vector<EmbSample*> emb_flat;
  std::atomic<size_t> cursor{0};

  // prefetch
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::queue<std::unique_ptr<Batch>> queue;
  std::atomic<bool> stop{false};
  std::atomic<bool> epoch_done{true};

  ~Loader() { shutdown(); }

  void shutdown() {
    stop = true;
    cv_push.notify_all();
    cv_pop.notify_all();
    if (worker.joinable()) worker.join();
  }

  void load_file(const std::string& path) {
    std::ifstream f(path);
    if (!f.is_open()) return;
    std::vector<EmbSample> embs;
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty()) continue;
      JsonParser jp(line);
      JsonValue v = jp.parse();
      if (v.type != JsonValue::OBJ) continue;
      if (v.get("text")) {
        GenSample g;
        const JsonValue* t = v.get("text");
        if (t->type == JsonValue::STR) {
          g.turns.push_back(t->str);
        } else {
          for (auto& x : t->arr) g.turns.push_back(x.str);
        }
        gen.push_back(std::move(g));
      } else if (v.get("query")) {
        EmbSample e;
        auto q = parse_pair(*v.get("query"));
        e.q_instr = q.first;
        e.q_text = q.second;
        if (auto* pos = v.get("pos"))
          for (auto& x : pos->arr) e.pos.push_back(parse_pair(x));
        if (auto* neg = v.get("neg"))
          for (auto& x : neg->arr) e.neg.push_back(parse_pair(x));
        if (!e.pos.empty()) embs.push_back(std::move(e));
      }
    }
    if (!embs.empty()) emb_sets.push_back(std::move(embs));
  }

  void finalize() {
    for (auto& s : emb_sets)
      for (auto& e : s) emb_flat.push_back(&e);
    len_emb = emb_flat.size();
  }

  // homogeneous batch order (gritlm_tpu/training/data.py homogeneous_batches)
  void start_epoch(uint64_t epoch) {
    // drain
    {
      std::unique_lock<std::mutex> lk(mu);
      while (!queue.empty()) queue.pop();
    }
    std::mt19937_64 rng(seed + 1000003ULL * epoch);
    batches.clear();
    std::vector<std::vector<int>> leftovers;
    int off = 0;
    for (auto& s : emb_sets) {
      std::vector<int> idx(s.size());
      for (size_t i = 0; i < s.size(); i++) idx[i] = off + (int)i;
      std::shuffle(idx.begin(), idx.end(), rng);
      size_t nfull = s.size() / batch_size;
      for (size_t b = 0; b < nfull; b++)
        batches.emplace_back(idx.begin() + b * batch_size,
                             idx.begin() + (b + 1) * batch_size);
      if (s.size() % batch_size)
        leftovers.emplace_back(idx.begin() + nfull * batch_size, idx.end());
      off += (int)s.size();
    }
    if (!leftovers.empty()) {
      std::shuffle(leftovers.begin(), leftovers.end(), rng);
      std::vector<int> pool;
      for (auto& l : leftovers) pool.insert(pool.end(), l.begin(), l.end());
      size_t nfull = pool.size() / batch_size;
      for (size_t b = 0; b < nfull; b++)
        batches.emplace_back(pool.begin() + b * batch_size,
                             pool.begin() + (b + 1) * batch_size);
    }
    std::shuffle(batches.begin(), batches.end(), rng);
    cursor = 0;
    epoch_done = false;
    if (!worker.joinable()) {
      worker = std::thread([this, epoch] { this->produce(epoch); });
    } else {
      // restart worker for the new epoch
      shutdown();
      stop = false;
      worker = std::thread([this, epoch] { this->produce(epoch); });
    }
  }

  void pad_into(const std::vector<int32_t>& ids, int width,
                std::vector<int32_t>& out_ids, std::vector<int32_t>& out_mask) {
    for (int i = 0; i < width; i++) {
      if (i < (int)ids.size()) {
        out_ids.push_back(ids[i]);
        out_mask.push_back(1);
      } else {
        out_ids.push_back(PAD_ID);
        out_mask.push_back(0);
      }
    }
  }

  std::string clip(const std::string& s) {
    return s.size() > max_char_len ? s.substr(0, max_char_len) : s;
  }

  void encode_embed(const std::string& instr, const std::string& text, int width,
                    std::vector<int32_t>& out_ids, std::vector<int32_t>& out_mask,
                    std::vector<int32_t>& out_il) {
    std::string full, prefix;
    format_embed(clip(instr), clip(text), full, prefix);
    std::vector<int32_t> ids, pids;
    tokenize_into(full, ids);
    tokenize_into(prefix, pids);
    pad_into(ids, width, out_ids, out_mask);
    out_il.push_back((int32_t)pids.size());
  }

  std::unique_ptr<Batch> make_batch(const std::vector<int>& idx,
                                    std::mt19937_64& rng) {
    auto b = std::make_unique<Batch>();
    for (int i : idx) {
      EmbSample* e = emb_flat[i];
      encode_embed(e->q_instr, e->q_text, qlen, b->q_ids, b->q_mask, b->q_il);
      // pos: uniform choice; negs: group_size-1 without replacement from a
      // cycled pool (gritlm_tpu/training/data.py GritDataset.__getitem__)
      auto& pos = e->pos[rng() % e->pos.size()];
      encode_embed(pos.first, pos.second, plen, b->p_ids, b->p_mask, b->p_il);
      int need = group_size - 1;
      if (need > 0 && !e->neg.empty()) {
        // cycle the neg list up to >= need, then sample without replacement
        std::vector<int> pool;
        int reps = std::max(1, (int)((need + e->neg.size() - 1) / e->neg.size()));
        for (int r2 = 0; r2 < reps; r2++)
          for (size_t j = 0; j < e->neg.size(); j++) pool.push_back((int)j);
        std::shuffle(pool.begin(), pool.end(), rng);
        for (int j = 0; j < need; j++) {
          auto& ng = e->neg[pool[j]];
          encode_embed(ng.first, ng.second, plen, b->p_ids, b->p_mask, b->p_il);
        }
      }
    }
    // generative: every take_nth-th slot, sample index paired with emb index
    int slot = 0;
    for (int i : idx) {
      if (slot++ % take_nth) continue;
      if (gen.empty()) continue;
      const GenSample& g = gen[(size_t)i < gen.size() ? i : rng() % gen.size()];
      std::vector<int32_t> ids;
      std::vector<int64_t> labels;
      for (size_t t = 0; t < g.turns.size(); t += 2) {
        std::string user = clip(g.turns[t]);
        std::string assistant =
            t + 1 < g.turns.size() ? rstrip(lstrip(clip(g.turns[t + 1]))) : "";
        std::string lead = (t == 0) ? BASE_BOS : TURN_SEP;
        std::string useg = lead + USER_BOS + user + USER_EOS + ASSISTANT_BOS;
        std::string aseg = assistant + ASSISTANT_EOS;
        std::vector<int32_t> u_ids, a_ids;
        tokenize_into(useg, u_ids);
        tokenize_into(aseg, a_ids);
        for (auto id : u_ids) { ids.push_back(id); labels.push_back(IGNORE); }
        for (auto id : a_ids) { ids.push_back(id); labels.push_back(id); }
      }
      for (int i2 = 0; i2 < glen; i2++) {
        if (i2 < (int)ids.size()) {
          b->g_ids.push_back(ids[i2]);
          b->g_mask.push_back(1);
          b->g_labels.push_back(labels[i2]);
        } else {
          b->g_ids.push_back(PAD_ID);
          b->g_mask.push_back(0);
          b->g_labels.push_back(IGNORE);
        }
      }
      b->g_count++;
    }
    return b;
  }

  void produce(uint64_t epoch) {
    std::mt19937_64 rng(seed * 2654435761ULL + epoch + 17);
    for (size_t bi = 0; bi < batches.size(); bi++) {
      if (stop) return;
      auto b = make_batch(batches[bi], rng);
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [this] {
        return stop || (int)queue.size() < prefetch_depth;
      });
      if (stop) return;
      queue.push(std::move(b));
      cv_pop.notify_one();
    }
    epoch_done = true;
    cv_pop.notify_all();
  }

  std::unique_ptr<Batch> next() {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [this] {
      return stop || !queue.empty() || (epoch_done && queue.empty());
    });
    if (queue.empty()) return nullptr;
    auto b = std::move(queue.front());
    queue.pop();
    cv_push.notify_one();
    return b;
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI

extern "C" {

void* gl_create(const char** files, int n_files, int batch_size, int group_size,
                int qlen, int plen, int glen, uint64_t seed, int take_nth,
                int prefetch_depth, int max_char_len) {
  auto* L = new Loader();
  L->batch_size = batch_size;
  L->group_size = group_size;
  L->qlen = qlen;
  L->plen = plen;
  L->glen = glen;
  L->seed = seed;
  L->take_nth = take_nth < 1 ? 1 : take_nth;
  L->prefetch_depth = prefetch_depth < 1 ? 2 : prefetch_depth;
  L->max_char_len = max_char_len;
  for (int i = 0; i < n_files; i++) L->load_file(files[i]);
  L->finalize();
  return L;
}

int gl_num_emb(void* h) { return (int)((Loader*)h)->len_emb; }
int gl_num_gen(void* h) { return (int)((Loader*)h)->gen.size(); }

void gl_start_epoch(void* h, uint64_t epoch) {
  ((Loader*)h)->start_epoch(epoch);
}

int gl_num_batches(void* h) { return (int)((Loader*)h)->batches.size(); }

// Returns 1 if a batch was written, 0 at epoch end.
int gl_next(void* h, int32_t* q_ids, int32_t* q_mask, int32_t* q_il,
            int32_t* p_ids, int32_t* p_mask, int32_t* p_il,
            int32_t* g_ids, int32_t* g_mask, int64_t* g_labels,
            int32_t* g_count) {
  Loader* L = (Loader*)h;
  auto b = L->next();
  if (!b) return 0;
  memcpy(q_ids, b->q_ids.data(), b->q_ids.size() * 4);
  memcpy(q_mask, b->q_mask.data(), b->q_mask.size() * 4);
  memcpy(q_il, b->q_il.data(), b->q_il.size() * 4);
  memcpy(p_ids, b->p_ids.data(), b->p_ids.size() * 4);
  memcpy(p_mask, b->p_mask.data(), b->p_mask.size() * 4);
  memcpy(p_il, b->p_il.data(), b->p_il.size() * 4);
  if (b->g_count) {
    memcpy(g_ids, b->g_ids.data(), b->g_ids.size() * 4);
    memcpy(g_mask, b->g_mask.data(), b->g_mask.size() * 4);
    memcpy(g_labels, b->g_labels.data(), b->g_labels.size() * 8);
  }
  *g_count = b->g_count;
  return 1;
}

void gl_destroy(void* h) { delete (Loader*)h; }

}  // extern "C"
