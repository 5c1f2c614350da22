// urdf_constants — standalone URDF → reduced-model constants extractor.
//
// Native (C++) replacement for the reference's use of casadi_kin_dyn /
// Pinocchio at startup (reference python/prb.py:28,92-96,130-139):
//   mass()            -> total mass
//   centerOfMass()    -> CoM at a given configuration
//   crba()[3:6,3:6]   -> composite rotational inertia about the CoM,
//                        expressed in the base frame (the "centroidal
//                        inertia in base" the reference prints, prb.py:96)
//   fk(frame)         -> world positions of contact frames
//
// The runtime framework never parses URDF; this tool runs offline and its
// JSON output is recorded into srbd_horizon_tpu/models/ (SURVEY.md §7.4
// item 6). Zero external dependencies: ships with a minimal XML parser
// sufficient for the URDF subset (link inertials, joints, origins).
//
// Usage:
//   urdf_constants robot.urdf [--joints v0,v1,...] [--frames a,b,c]
//                  [--world-frame link]
// Joint values are assigned to non-fixed joints in document order; the
// floating base pose is identity unless --joints starts with 7 values and
// --floating-base is given. --world-frame re-expresses everything so that
// the named link is the world origin (reference utilities.py:12-32
// setWorld semantics).

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

// ----------------------------- tiny linear algebra -----------------------

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
};

struct Mat3 {
  double m[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  static Mat3 zero() {
    Mat3 r;
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) r.m[i][j] = 0;
    return r;
  }
  Mat3 operator*(const Mat3& o) const {
    Mat3 r = zero();
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++)
        for (int k = 0; k < 3; k++) r.m[i][j] += m[i][k] * o.m[k][j];
    return r;
  }
  Vec3 operator*(const Vec3& v) const {
    return {m[0][0] * v.x + m[0][1] * v.y + m[0][2] * v.z,
            m[1][0] * v.x + m[1][1] * v.y + m[1][2] * v.z,
            m[2][0] * v.x + m[2][1] * v.y + m[2][2] * v.z};
  }
  Mat3 T() const {
    Mat3 r;
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) r.m[i][j] = m[j][i];
    return r;
  }
  Mat3 operator+(const Mat3& o) const {
    Mat3 r;
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++) r.m[i][j] = m[i][j] + o.m[i][j];
    return r;
  }
  static Mat3 rpy(double r, double p, double y) {
    double cr = cos(r), sr = sin(r), cp = cos(p), sp = sin(p), cy = cos(y),
           sy = sin(y);
    Mat3 R;
    R.m[0][0] = cy * cp;
    R.m[0][1] = cy * sp * sr - sy * cr;
    R.m[0][2] = cy * sp * cr + sy * sr;
    R.m[1][0] = sy * cp;
    R.m[1][1] = sy * sp * sr + cy * cr;
    R.m[1][2] = sy * sp * cr - cy * sr;
    R.m[2][0] = -sp;
    R.m[2][1] = cp * sr;
    R.m[2][2] = cp * cr;
    return R;
  }
  static Mat3 axis_angle(const Vec3& a, double th) {
    double c = cos(th), s = sin(th), C = 1 - c;
    Mat3 R;
    R.m[0][0] = a.x * a.x * C + c;
    R.m[0][1] = a.x * a.y * C - a.z * s;
    R.m[0][2] = a.x * a.z * C + a.y * s;
    R.m[1][0] = a.y * a.x * C + a.z * s;
    R.m[1][1] = a.y * a.y * C + c;
    R.m[1][2] = a.y * a.z * C - a.x * s;
    R.m[2][0] = a.z * a.x * C - a.y * s;
    R.m[2][1] = a.z * a.y * C + a.x * s;
    R.m[2][2] = a.z * a.z * C + c;
    return R;
  }
};

struct Transform {
  Mat3 R;
  Vec3 p;
  Transform operator*(const Transform& o) const {
    return {R * o.R, R * o.p + p};
  }
  Transform inverse() const {
    Mat3 Rt = R.T();
    return {Rt, Rt * (p * -1.0)};
  }
};

// ----------------------------- minimal XML parser ------------------------

struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;
  const XmlNode* child(const std::string& t) const {
    for (auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
  std::string attr(const std::string& k, const std::string& dflt = "") const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second;
  }
};

class XmlParser {
 public:
  explicit XmlParser(std::string text) : s_(std::move(text)) {}

  std::unique_ptr<XmlNode> parse() {
    skip_prolog();
    return parse_element();
  }

 private:
  std::string s_;
  size_t i_ = 0;

  void skip_ws() {
    while (i_ < s_.size() && isspace((unsigned char)s_[i_])) i_++;
  }
  void skip_prolog() {
    for (;;) {
      skip_ws();
      if (s_.compare(i_, 2, "<?") == 0) {
        i_ = s_.find("?>", i_) + 2;
      } else if (s_.compare(i_, 4, "<!--") == 0) {
        i_ = s_.find("-->", i_) + 3;
      } else {
        return;
      }
    }
  }
  std::unique_ptr<XmlNode> parse_element() {
    skip_ws();
    if (i_ >= s_.size() || s_[i_] != '<') return nullptr;
    i_++;  // '<'
    auto node = std::make_unique<XmlNode>();
    while (i_ < s_.size() && !isspace((unsigned char)s_[i_]) &&
           s_[i_] != '>' && s_[i_] != '/')
      node->tag += s_[i_++];
    // attributes
    for (;;) {
      skip_ws();
      if (s_[i_] == '/') {
        i_ += 2;  // "/>"
        return node;
      }
      if (s_[i_] == '>') {
        i_++;
        break;
      }
      std::string key, val;
      while (i_ < s_.size() && s_[i_] != '=' && !isspace((unsigned char)s_[i_]))
        key += s_[i_++];
      skip_ws();
      if (s_[i_] == '=') i_++;
      skip_ws();
      char quote = s_[i_++];
      while (i_ < s_.size() && s_[i_] != quote) val += s_[i_++];
      i_++;
      node->attrs[key] = val;
    }
    // children / text until close tag
    for (;;) {
      skip_ws();
      if (s_.compare(i_, 4, "<!--") == 0) {
        i_ = s_.find("-->", i_) + 3;
        continue;
      }
      if (s_.compare(i_, 2, "</") == 0) {
        i_ = s_.find('>', i_) + 1;
        return node;
      }
      if (s_[i_] == '<') {
        auto c = parse_element();
        if (c) node->children.push_back(std::move(c));
      } else {
        while (i_ < s_.size() && s_[i_] != '<') i_++;  // skip text
      }
    }
  }
};

// ----------------------------- URDF model --------------------------------

static Vec3 parse_vec3(const std::string& s) {
  Vec3 v;
  sscanf(s.c_str(), "%lf %lf %lf", &v.x, &v.y, &v.z);
  return v;
}

static Transform parse_origin(const XmlNode* n) {
  Transform t;
  if (!n) return t;
  Vec3 xyz = parse_vec3(n->attr("xyz", "0 0 0"));
  Vec3 rpy = parse_vec3(n->attr("rpy", "0 0 0"));
  t.p = xyz;
  t.R = Mat3::rpy(rpy.x, rpy.y, rpy.z);
  return t;
}

struct Link {
  std::string name;
  double mass = 0;
  Transform inertial_origin;  // link frame -> inertial frame
  Mat3 inertia;               // about inertial origin, in inertial axes
};

struct Joint {
  std::string name, type, parent, child;
  Transform origin;
  Vec3 axis{1, 0, 0};
};

struct Model {
  std::map<std::string, Link> links;
  std::vector<Joint> joints;  // document order
  std::string root;

  void load(const XmlNode* robot) {
    std::map<std::string, bool> has_parent;
    for (auto& c : robot->children) {
      if (c->tag == "link") {
        Link l;
        l.name = c->attr("name");
        l.inertia = Mat3::zero();
        if (const XmlNode* in = c->child("inertial")) {
          l.inertial_origin = parse_origin(in->child("origin"));
          if (const XmlNode* m = in->child("mass"))
            l.mass = atof(m->attr("value", "0").c_str());
          if (const XmlNode* I = in->child("inertia")) {
            l.inertia.m[0][0] = atof(I->attr("ixx", "0").c_str());
            l.inertia.m[1][1] = atof(I->attr("iyy", "0").c_str());
            l.inertia.m[2][2] = atof(I->attr("izz", "0").c_str());
            l.inertia.m[0][1] = l.inertia.m[1][0] =
                atof(I->attr("ixy", "0").c_str());
            l.inertia.m[0][2] = l.inertia.m[2][0] =
                atof(I->attr("ixz", "0").c_str());
            l.inertia.m[1][2] = l.inertia.m[2][1] =
                atof(I->attr("iyz", "0").c_str());
          }
        }
        links[l.name] = l;
        if (!has_parent.count(l.name)) has_parent[l.name] = false;
      } else if (c->tag == "joint") {
        Joint j;
        j.name = c->attr("name");
        j.type = c->attr("type");
        if (const XmlNode* p = c->child("parent")) j.parent = p->attr("link");
        if (const XmlNode* ch = c->child("child")) j.child = ch->attr("link");
        j.origin = parse_origin(c->child("origin"));
        if (const XmlNode* a = c->child("axis"))
          j.axis = parse_vec3(a->attr("xyz", "1 0 0"));
        joints.push_back(j);
        has_parent[j.child] = true;
        if (!has_parent.count(j.parent)) has_parent[j.parent] = false;
      }
    }
    for (auto& [name, hp] : has_parent)
      if (!hp) root = name;
  }

  // FK: world transform of every link at joint configuration q (values for
  // non-fixed joints in document order), base at `base`.
  std::map<std::string, Transform> fk(const Transform& base,
                                      const std::vector<double>& q) const {
    std::map<std::string, Transform> T;
    T[root] = base;
    // iterate joints until all resolved (tree in arbitrary order)
    std::vector<bool> done(joints.size(), false);
    std::map<std::string, size_t> qi;  // joint -> q index
    {
      size_t k = 0;
      for (auto& j : joints)
        if (j.type != "fixed") qi[j.name] = k++;
    }
    bool progress = true;
    while (progress) {
      progress = false;
      for (size_t i = 0; i < joints.size(); i++) {
        if (done[i]) continue;
        const Joint& j = joints[i];
        auto it = T.find(j.parent);
        if (it == T.end()) continue;
        Transform Tj = it->second * j.origin;
        if (j.type == "revolute" || j.type == "continuous") {
          double v = qi.count(j.name) && qi[j.name] < q.size() ? q[qi[j.name]] : 0.0;
          Transform rot;
          rot.R = Mat3::axis_angle(j.axis, v);
          Tj = Tj * rot;
        } else if (j.type == "prismatic") {
          double v = qi.count(j.name) && qi[j.name] < q.size() ? q[qi[j.name]] : 0.0;
          Transform tr;
          tr.p = j.axis * v;
          Tj = Tj * tr;
        }  // fixed / floating(identity at q=0)
        T[j.child] = Tj;
        done[i] = true;
        progress = true;
      }
    }
    return T;
  }
};

// ----------------------------- main --------------------------------------

static std::vector<double> parse_csv(const std::string& s) {
  std::vector<double> v;
  std::stringstream ss(s);
  std::string tok;
  while (std::getline(ss, tok, ',')) v.push_back(atof(tok.c_str()));
  return v;
}

static std::vector<std::string> parse_csv_str(const std::string& s) {
  std::vector<std::string> v;
  std::stringstream ss(s);
  std::string tok;
  while (std::getline(ss, tok, ',')) v.push_back(tok);
  return v;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr,
            "usage: %s robot.urdf [--joints v,...] [--frames a,b,...] "
            "[--world-frame link]\n",
            argv[0]);
    return 1;
  }
  std::ifstream f(argv[1]);
  if (!f) {
    fprintf(stderr, "cannot open %s\n", argv[1]);
    return 1;
  }
  std::stringstream buf;
  buf << f.rdbuf();

  std::vector<double> q;
  std::vector<std::string> frames;
  std::string world_frame;
  for (int i = 2; i < argc; i++) {
    if (!strcmp(argv[i], "--joints") && i + 1 < argc) q = parse_csv(argv[++i]);
    else if (!strcmp(argv[i], "--frames") && i + 1 < argc)
      frames = parse_csv_str(argv[++i]);
    else if (!strcmp(argv[i], "--world-frame") && i + 1 < argc)
      world_frame = argv[++i];
  }

  XmlParser parser(buf.str());
  auto root = parser.parse();
  if (!root || root->tag != "robot") {
    fprintf(stderr, "not a URDF robot file\n");
    return 1;
  }
  Model model;
  model.load(root.get());

  Transform base;  // identity
  auto T = model.fk(base, q);

  // re-express in world_frame (reference utilities.py:12-32 setWorld)
  if (!world_frame.empty() && T.count(world_frame)) {
    Transform W = T[world_frame].inverse();
    for (auto& [k, t] : T) T[k] = W * t;
  }

  // mass, CoM
  double mass = 0;
  Vec3 com{0, 0, 0};
  for (auto& [name, link] : model.links) {
    if (link.mass <= 0 || !T.count(name)) continue;
    Transform Ti = T.at(name) * link.inertial_origin;
    mass += link.mass;
    com = com + Ti.p * link.mass;
  }
  if (mass > 0) com = com * (1.0 / mass);

  // composite rotational inertia about the CoM in world axes
  Mat3 I = Mat3::zero();
  for (auto& [name, link] : model.links) {
    if (link.mass <= 0 || !T.count(name)) continue;
    Transform Ti = T.at(name) * link.inertial_origin;
    Mat3 Iw = Ti.R * link.inertia * Ti.R.T();
    Vec3 r = Ti.p - com;
    double r2 = r.dot(r);
    Mat3 par = Mat3::zero();
    double rr[3] = {r.x, r.y, r.z};
    for (int a = 0; a < 3; a++)
      for (int b = 0; b < 3; b++)
        par.m[a][b] = link.mass * ((a == b ? r2 : 0.0) - rr[a] * rr[b]);
    I = I + Iw + par;
  }

  // JSON out
  printf("{\n  \"mass\": %.12g,\n", mass);
  printf("  \"com\": [%.12g, %.12g, %.12g],\n", com.x, com.y, com.z);
  printf("  \"inertia\": [");
  for (int a = 0; a < 3; a++) {
    printf("[%.12g, %.12g, %.12g]%s", I.m[a][0], I.m[a][1], I.m[a][2],
           a < 2 ? ", " : "");
  }
  printf("],\n  \"frames\": {");
  bool first = true;
  for (auto& fr : frames) {
    if (!T.count(fr)) continue;
    const Vec3& p = T.at(fr).p;
    printf("%s\n    \"%s\": [%.12g, %.12g, %.12g]", first ? "" : ",",
           fr.c_str(), p.x, p.y, p.z);
    first = false;
  }
  printf("\n  }\n}\n");
  return 0;
}
